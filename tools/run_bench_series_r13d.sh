#!/bin/bash
# r13 cap-fix confirmation series: 4 Spark runs after raising the plan
# cache per-session cap (8 -> 24); same protocol, quiet host.
set -u
cd /root/repo
for i in 20 21 22 23; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py 2>/dev/null | tail -1 > "artifacts/BENCH_r13_local$i.json"
  echo "run $i done $(date +%H:%M:%S)"
done
