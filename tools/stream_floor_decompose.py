#!/usr/bin/env python
"""Decompose the stream-start floor of the forced-multi-batch sketch
streams (OPTIMIZATION_r13 'not yet optimized' #1): how much of
s_cms_merge's bench cost is per-SESSION (stream start: source listing,
checkpoint setup, query planning) vs per-BATCH (the foreachBatch
read-merge-write cycle) vs the batch-side probe report.

Method: a StreamingQueryListener records every micro-batch's progress
(durationMs breakdown: triggerExecution = full trigger incl. the
foreachBatch body, queryPlanning, getBatch/latestOffset source costs);
wall-clock splits the query into construct+drain vs the final probe
report (noop sink). Repeat N times on a QUIET host.

Usage: SPARK_GRAFT_CPUS=32 python tools/stream_floor_decompose.py \
           [--sf /root/testdata/sf0.1] [--n 3] [--query s_cms_merge]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--query", default="s_cms_merge")
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    from udlang_spark.queries import streaming as S
    from udlang_spark.session import get_spark, release_caches

    spark = get_spark()

    batches: list[dict] = []
    starts: list[float] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            starts.append(time.time())

        def onQueryProgress(self, event):
            p = event.progress
            batches.append(
                {
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _L()
    spark.streams.addListener(listener)

    q = S.QUERIES[args.query]
    # warm: one full run so codegen/JIT and the replay dir are in place
    q(spark, args.sf).write.format("noop").mode("overwrite").save()

    try:
        for i in range(args.n):
            release_caches()
            batches.clear()
            starts.clear()
            t0 = time.time()
            df = q(spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            trig = sum(
                b["durationMs"].get("triggerExecution", 0) for b in batches
            )
            plan = sum(
                b["durationMs"].get("queryPlanning", 0) for b in batches
            )
            # time from query() entry to first listener start event =
            # replay-dir reuse check + stream construction + startup
            start_lag = (starts[0] - t0) if starts else None
            out = {
                "run": i,
                "total_s": round(t2 - t0, 3),
                "construct_plus_drain_s": round(t1 - t0, 3),
                "probe_report_exec_s": round(t2 - t1, 3),
                "pre_stream_start_s": (
                    round(start_lag, 3) if start_lag is not None else None
                ),
                "n_batches": len(batches),
                "batch_trigger_total_s": round(trig / 1000.0, 3),
                "batch_planning_total_s": round(plan / 1000.0, 3),
                "per_batch_ms": [
                    {
                        "id": b["batchId"],
                        "rows": b["numInputRows"],
                        **{
                            k: v
                            for k, v in b["durationMs"].items()
                            if k
                            in (
                                "triggerExecution",
                                "queryPlanning",
                                "addBatch",
                                "getBatch",
                                "latestOffset",
                                "walCommit",
                                "commitOffsets",
                            )
                        },
                    }
                    for b in batches
                ],
            }
            print(json.dumps(out))
    finally:
        spark.streams.removeListener(listener)


if __name__ == "__main__":
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    main()
