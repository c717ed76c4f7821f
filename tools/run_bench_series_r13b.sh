#!/bin/bash
# r13 series extension: +5 Spark runs, then a DuckDB min-of-3 refresh —
# the r12 pattern (7+5 Spark, 8+3 oracle), back-to-back on a quiet host.
set -u
cd /root/repo
for i in 8 9 10 11 12; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py 2>/dev/null | tail -1 > "artifacts/BENCH_r13_local$i.json"
  echo "run $i done $(date +%H:%M:%S)"
done
python tools/oracle_bench.py --sf /root/testdata/sf0.1 --runs 3 2>/dev/null \
  | tail -1 > artifacts/ORACLE_BENCH_r13b.json
echo "oracle refresh done $(date +%H:%M:%S)"
