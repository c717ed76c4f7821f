"""Skew mitigation helpers (SURVEY.md §2.5/§2.6 scale notes).

AQE's skew-join splitting handles most runtime skew; these helpers are the
explicit forms for planned skew — when a key's fan-in is known to be
pathological (a null-ish default key, a celebrity user, boilerplate text):

- `salted_join`: left rows get a deterministic salt in [0, n); the (small)
  right side is replicated across all n salts; the join key becomes
  (key, salt), splitting each hot key's rows across n reducers.
- `salted_agg`: two-stage aggregation — partial aggregate on (key, salt),
  final aggregate on key. Sum/count compose exactly; the partial shuffle
  spreads a hot key over n partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(cols: list[str], n: int) -> Column:
    """Deterministic pseudo-uniform salt derived from the row content —
    stable across retries (no rand()), which matters for speculative
    execution and recompute-on-failure."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys split across n_salts
    reducers. The right side is replicated n_salts× — use only when right
    is the small side (dimension-ish); result equals `left.join(right, on,
    how)` exactly for inner/left joins. right/full outer are REFUSED: an
    unmatched right key's n_salts replicas would each emit a null-padded
    row, n_salts-plicating the plain join's single row."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} — right/full "
            "outer would duplicate unmatched right rows once per salt"
        )
    l_salted = left.withColumn("_salt", _salt_of(left.columns, n_salts))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_replicated, [on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: count/sum/min/max per key.
    Equivalent to df.groupBy(key).agg(...) for decomposable aggregates."""
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        alias = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(alias))
            final_exprs.append(getattr(F, fn)(alias).alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = df.withColumn("_salt", _salt_of(df.columns, n_salts))
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def skew_report(df: DataFrame, key: str, n_cores: int = 32) -> DataFrame:
    """Per-key skew diagnostics feeding the measured salting decision rule
    (artifacts/SKEW_BENCH_r06.json, SURVEY §9 r6): salting a join/agg on
    `key` pays off only when one key's share of rows exceeds a fair core
    share (~1/n_cores) — below that the salt hash + dim replication is a
    pure loss. Emits every key with its count, share, and the
    `salt_recommended` flag share > 1/n_cores.

    Scale shape: ONE map-side-combining count aggregate on the key — the
    same shuffle the join/agg under diagnosis would do, so the probe can
    piggyback on an existing profile pass; the output relation is bounded
    by key cardinality (sample or top-k it for very-high-cardinality
    keys). The total derives from the grouped counts via an unpartitioned
    window SUM over that bounded key-count relation — NOT a separate
    df.count() action, which would scan the (possibly 100 TB) input a
    second time per probe. The single-partition window is safe precisely
    because its input is the key-count relation, not the raw rows."""
    from pyspark.sql.window import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        key,
        "n",
        F.round(F.col("n").cast("double") / total.cast("double"), 6).alias(
            "share"
        ),
        (F.col("n") * n_cores > total).alias("salt_recommended"),
    )
