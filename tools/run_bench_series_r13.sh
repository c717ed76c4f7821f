#!/bin/bash
# r13 bench protocol: N Spark bench runs then the DuckDB oracle series,
# back-to-back on a quiet host (same protocol as r11/r12).
set -u
cd /root/repo
for i in 1 2 3 4 5 6 7; do
  if [ -s "artifacts/BENCH_r13_local$i.json" ]; then
    echo "run $i exists, skipping"
    continue
  fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py 2>/dev/null | tail -1 > "artifacts/BENCH_r13_local$i.json"
  echo "run $i done $(date +%H:%M:%S)"
done
python tools/oracle_bench.py --sf /root/testdata/sf0.1 --runs 8 2>/dev/null \
  | tail -1 > artifacts/ORACLE_BENCH_r13.json
echo "oracle done $(date +%H:%M:%S)"
