"""10× scale stress for newly-landed operators (SURVEY §9 discipline).

Replicates the sf0.1 tables 10× into /tmp (ids re-keyed per copy so key
cardinalities scale too), then times each target query warm at 1× and 10×
and prints the ratio. Linear-or-better ratios are the pass condition; a
super-linear ratio flags a hidden quadratic or a driver bottleneck.

Usage: SPARK_GRAFT_CPUS=16 python tools/scale_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SCALE_STRESS_COPIES", "10"))
TENX = os.environ.get(
    "SCALE_STRESS_DIR", f"/tmp/udlang_scale{COPIES}x_r07"
)

# (table, id columns to re-key per copy)
TABLES = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id", "user_id"),
}

# round-7 operators under test (round-6 set lives in SCALE_STRESS_r06.json);
# override with SCALE_STRESS_TARGETS=a,b,c
TARGETS = os.environ.get("SCALE_STRESS_TARGETS", "").split(",") if os.environ.get("SCALE_STRESS_TARGETS") else [
    "t_kmv_jaccard",
    "t_group_quantiles",
    "m_ahash_dedup",
    "e_negative_pairs",
    "q70_bucketed_join",
    "q71_zorder_layout",
    "q72_interval_union",
    "q73_copurchase_pairs",
]


def build_tenx(spark) -> None:
    os.makedirs(TENX, exist_ok=True)
    for table, id_cols in TABLES.items():
        dst = os.path.join(TENX, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(os.path.join(BASE, f"{table}.parquet"))
        maxes = src.agg(
            *[F.max(c).alias(c) for c in id_cols]
        ).collect()[0]
        rep = src.withColumn(
            "_copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        for c in id_cols:
            stride = int(maxes[c]) + 1
            rep = rep.withColumn(c, F.col(c) + F.col("_copy") * stride)
        rep.drop("_copy").write.mode("overwrite").parquet(dst)


def time_query(spark, fn, sf_dir: str) -> float:
    from udlang_spark.session import release_caches

    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    release_caches()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_caches()
    return best


def main() -> None:
    from udlang_spark.queries import QUERIES
    from udlang_spark.session import get_spark

    spark = get_spark("udlang_scale_stress")
    spark.sparkContext.setLogLevel("ERROR")
    build_tenx(spark)

    out = {}
    for name in TARGETS:
        t1 = time_query(spark, QUERIES[name], BASE)
        t10 = time_query(spark, QUERIES[name], TENX)
        out[name] = {
            "t_1x": round(t1, 3),
            "t_10x": round(t10, 3),
            "ratio": round(t10 / t1, 2),
        }
        print(f"{name}: 1x {t1:.2f}s  10x {t10:.2f}s  ratio {t10 / t1:.2f}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
