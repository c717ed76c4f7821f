#!/bin/bash
# r13 final confirmation series after the d_incremental_neardup plan
# cache: 3 Spark runs, same protocol, quiet host.
set -u
cd /root/repo
for i in 24 25 26; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py 2>/dev/null | tail -1 > "artifacts/BENCH_r13_local$i.json"
  echo "run $i done $(date +%H:%M:%S)"
done
