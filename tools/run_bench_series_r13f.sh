#!/bin/bash
# r13 confirmation series after the q67/e_hamming_topk/t_wordpiece plan
# caches (third-session batch 2): 3 Spark runs, same protocol, quiet host.
set -u
cd /root/repo
for i in 27 28 29; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py 2>/dev/null | tail -1 > "artifacts/BENCH_r13_local$i.json"
  echo "run $i done $(date +%H:%M:%S)"
done
