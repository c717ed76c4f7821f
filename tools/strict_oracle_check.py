"""Strict driver-replica differential check.

The external driver compares each registered query against its DuckDB oracle
at sf0.01 by row count, sorted column names, and an order-insensitive value
hash. Its canonicalization is STRICTER than tests/oracle_harness.py: a DuckDB
HUGEINT/DECIMAL that pandas fetches as float hashes differently from Spark's
long (round-2 verdict observed ``99111.0`` vs ``99111``). This tool replays
that strict comparison over any slice of the registry so dtype drift is caught
before the driver ever sees it.

Usage:
    python tools/strict_oracle_check.py [--first N] [--names a,b,c] [--sf DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    """Strict canonical form: float and int are DISTINCT (unlike the loose
    test harness); Decimal keeps exactness when integral."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return f"i:{int(v)}"
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # fold -0.0: engines that disagree only in zero sign agree
        return f"f:{v:.17g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime, date)):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return "s:" + str(v)


def fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("--names", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from udlang_spark.queries import ORACLE, QUERIES

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("strict-oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        names = list(QUERIES)[: args.first]

    failures, skipped = [], []
    for name in names:
        if name not in ORACLE:
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            sn, scols, shash = fingerprint(sdf.columns, srows)
            # DBAPI cursor.description reports every numeric column's
            # type_code as the generic 'NUMBER'; real type names need DESCRIBE
            dtypes = [
                row[1] for row in con.execute("DESCRIBE " + ORACLE[name]).fetchall()
            ]
            cur = con.execute(ORACLE[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            dn, dcols_s, dhash = fingerprint(dcols, drows)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append((name, f"ERROR {type(e).__name__}: {e}"))
            print(f"  {name}: ERROR {e}", flush=True)
            continue
        finally:
            from udlang_spark.session import release_caches

            release_caches()  # queries may persist intermediates
        dt = time.time() - t0
        risky = [
            f"{c}:{ty}"
            for c, ty in zip(dcols, dtypes)
            if ty in ("HUGEINT", "UHUGEINT") or ty.startswith("DECIMAL")
        ]
        ok = scols == dcols_s and sn == dn and shash == dhash
        mark = "ok " if ok else "FAIL"
        extra = f" riskydtypes={risky}" if risky else ""
        print(f"  {mark} {name} rows={sn}/{dn} {dt:.1f}s{extra}", flush=True)
        if not ok:
            detail = []
            if scols != dcols_s:
                detail.append(f"cols {scols} != {dcols_s}")
            if sn != dn:
                detail.append(f"rows {sn} != {dn}")
            if shash != dhash:
                detail.append("value-hash mismatch")
            failures.append((name, "; ".join(detail)))

    print(f"\nchecked={len(names) - len(skipped)} skipped(no-oracle)={skipped}")
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print("ALL STRICT-GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
