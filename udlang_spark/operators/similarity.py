"""Similarity search over embedding columns (array<float>).

- `cosine`: pure Column expression — zip_with + aggregate in double
  precision (JVM codegen; deterministic fold order so the DuckDB oracle
  reproduces it bit-for-bit).
- `cosine_topk`: brute-force k-NN — the correctness baseline. O(n²) pairs:
  right at small n, the verification layer at scale.
- `lsh_ann_topk`: sign-random-projection LSH — deterministic hyperplanes
  derived from xxhash64, bucket by signature, search only bucket-mates.
  The 100 TB path: one shuffle on the bucket key, per-bucket quadratic
  bounded by bucket size; recall tunable via n_planes/n_tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k neighbors per vector. Deterministic ranking:
    cosine rounded to 6 decimals, ties broken by neighbor id."""
    a = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("nbr"), F.col(vec_col).alias("vec_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("nbr"))
        .select(
            "vec_id",
            "nbr",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("nbr"))
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(f"plane:{plane}:{dim}"))
    return (h % 10_000_003).cast("double") / 5_000_001.5


def signature(vec: Column, n_planes: int, n_dims: int, table: int = 0) -> Column:
    """Sign-random-projection bit string of length n_planes."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(
                    *[_plane_component(table * 1000 + p, d) for d in range(n_dims)]
                ),
                lambda x, r: x.cast("double") * r,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 2,
    n_dims: int = 64,
) -> DataFrame:
    """Approximate top-k: vectors sharing an LSH bucket in ANY of n_tables
    signature tables are compared; ranking as in cosine_topk. Recall rises
    with n_tables, bucket size falls with n_planes."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    buckets = base.select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"t{t}:"), signature(F.col("vec"), n_planes, n_dims, t))
                    for t in range(n_tables)
                ]
            )
        ).alias("bucket"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("vec_id"),
            F.col("b.id").alias("nbr"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["vec_id", "nbr"])
        .select(
            "vec_id",
            "nbr",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("nbr"))
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
