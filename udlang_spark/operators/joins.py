"""Join extensions beyond stock equi-joins (SURVEY.md §2.5 — the reference
has no joins at all; these are engine extensions for the north star).

- `asof_join`: for each left row, the most recent right row with
  r.ts <= l.ts sharing the key. Implemented as union + partitioned window
  (`last(ignorenulls)`) — ONE shuffle on the key, no range-join row
  explosion. This is the 100 TB shape: a naive l.ts >= r.ts theta-join
  materializes O(|L|·|R|/keys) pairs; the union-window form is linear and
  AQE handles key skew.
- `range_join`: interval containment join (point-in-range). Expressed as a
  plain predicate join so Catalyst can choose broadcast when a side is
  small; for big-big, bucketize the range into discrete join keys first
  (the classic interval-bucketing trick) — provided here via `bucket_width`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left columns plus, per left row, `prefix`+ts and
    `prefix`+c for each value col of the latest right row with
    right.ts <= left.ts and equal `by` key (NULLs when no such row).

    Tie order: a right row at exactly left.ts IS visible (matches DuckDB
    `ASOF JOIN ... ON l.ts >= r.ts`); among right rows with identical ts the
    last by (ts, value_cols) order wins deterministically.
    """
    payload = F.struct(
        F.col(right_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    r_side = right.select(
        F.col(by).alias(by),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != by],
    )
    l_side = left.select(
        by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        *[c for c in left.columns if c != by],
    )
    u = l_side.unionByName(r_side)
    # right rows sort before left rows at equal ts, so equality is inclusive;
    # `_r` (the payload struct) joins the ordering so ties among right rows
    # at the SAME ts resolve deterministically (struct order = field order:
    # ts, then value_cols) instead of by shuffle arrival
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_ts"), F.col("_is_left"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_m.{prefix}ts").alias(f"{prefix}ts")
    ] + [F.col(f"_m.{prefix}{c}").alias(f"{prefix}{c}") for c in value_cols]
    return matched.filter(F.col("_is_left") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    point_col: str,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    extra_on: Column | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows paired with right rows where
    lo <= point < hi (plus optional extra equi-condition).

    With `bucket_width`, both sides are exploded onto discrete buckets and
    the join becomes an equi-join on the bucket id (then re-filtered) — the
    big-big path that avoids a nested-loop. Without it, the predicate join
    lets Catalyst broadcast the small side.
    """
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if extra_on is not None:
        cond = cond & extra_on
    if bucket_width is None:
        return left.join(right, cond)
    # floor/ceil bucket arithmetic, NOT long-cast truncation: truncation
    # toward zero mis-buckets negative fractional points, and a fractional
    # interval bound (e.g. [9.5, 10.5) at width 10) would silently lose its
    # upper bucket. floor(lo/w)..ceil(hi/w)-1 covers [lo, hi) exactly for
    # any real-valued bounds; empty intervals are dropped (Spark's sequence
    # would otherwise DESCEND when start > stop).
    lb = left.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    rb = right.filter(F.col(lo_col) < F.col(hi_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                (F.ceil(F.col(hi_col) / F.lit(bucket_width)) - 1).cast("long"),
            )
        ),
    )
    return lb.join(rb, "_bucket").filter(cond).drop("_bucket")
