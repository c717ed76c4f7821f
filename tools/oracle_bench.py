#!/usr/bin/env python
"""Time the DuckDB oracles for the bench headline queries at a given SF —
the grounding for the "within 2x of baseline" gate: the reference publishes
no numbers (roadmap.md:17-19), so the oracles ARE the single-node baseline
the Spark engine is compared against (same data, same results, 32 threads).

Usage: python tools/oracle_bench.py [--sf DIR] [--runs N]
Prints one JSON line: {"total_sec": ..., "queries": {name: sec}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--threads", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import duckdb

    from bench import HEADLINE
    from udlang_spark.queries import ORACLE

    con = duckdb.connect()
    con.execute(f"SET threads = {args.threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in ORACLE:
            continue
        sql = ORACLE[name]
        con.execute(sql).fetchall()  # warm (I/O cache, plan)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total",
                "total_sec": round(sum(timings.values()), 4),
                "queries": timings,
                "sf_dir": args.sf,
                "threads": args.threads,
            }
        )
    )


if __name__ == "__main__":
    main()
