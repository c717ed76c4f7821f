#!/usr/bin/env python
"""Isolated same-session timing for named queries: min-of-N with the noop
sink, one warmup execution per query shape first (JIT/codegen is session
setup, not operator cost — bench.py methodology). Use two checkouts or a
toggled code path for A/B; interleave arms by running this alternately.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python tools/ab_time.py --n 4 d_span_scrub t_lang_quality_bands
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
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--clear-plan-cache", action="store_true",
                    help="clear the plan cache before EVERY timed run "
                    "(times construction+execution instead of hits)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from udlang_spark.queries import QUERIES
    from udlang_spark.session import get_spark, plan_cache, release_caches

    spark = get_spark("udlang_spark_ab")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float]] = {}
    for name in args.names:
        if name not in QUERIES:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"ab:{name}:warmup")
        QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        vals = []
        for i in range(args.n):
            if args.clear_plan_cache:
                plan_cache.clear()
                release_caches()
            spark.sparkContext.setJobDescription(f"ab:{name}:{i}")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            vals.append(round(time.perf_counter() - t0, 4))
        release_caches()
        out[name] = {"min": min(vals), "runs": vals}
        print(f"{name}: min={min(vals)} runs={vals}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
