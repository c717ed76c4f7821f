"""Local replica of the driver's correctness check: run a Spark query and its
DuckDB oracle side-by-side, compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized)."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 1e15:
            return f"i:{int(v)}"
        return f"f:{v:.17g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime, date)):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return "s:" + str(v)


def table_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), h


def spark_fingerprint(df):
    rows = [tuple(r) for r in df.collect()]
    return table_fingerprint(df.columns, rows)


def duck_fingerprint(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return table_fingerprint(cols, rows)


def compare(spark, con, name: str, query_fn, oracle: str, sf_dir: str):
    from udlang_spark.session import release_caches

    try:
        sn, scols, shash = spark_fingerprint(query_fn(spark, sf_dir))
    finally:
        release_caches()  # queries may persist intermediates; don't let
        # cached blocks accumulate over the session-scoped sweep
    dn, dcols, dhash = duck_fingerprint(con, oracle)
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert sn == dn, f"{name}: rowcount {sn} != {dn}"
    assert shash == dhash, f"{name}: value hash mismatch ({sn} rows)"
