#!/bin/bash
# r13 post-change series (probe plan caches + classifier literal):
# 5 Spark runs then a DuckDB min-of-2 refresh, back-to-back, quiet host.
set -u
cd /root/repo
for i in 15 16 17 18 19; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py 2>/dev/null | tail -1 > "artifacts/BENCH_r13_local$i.json"
  echo "run $i done $(date +%H:%M:%S)"
done
python tools/oracle_bench.py --sf /root/testdata/sf0.1 --runs 2 2>/dev/null \
  | tail -1 > artifacts/ORACLE_BENCH_r13c.json
echo "oracle refresh done $(date +%H:%M:%S)"
