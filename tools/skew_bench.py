"""Skew-stress measurement: salted_join vs plain SMJ vs AQE skew-join.

Synthesizes a hot-key fact relation at $SPARK_GRAFT_SF_DIR scale (one key
holds ~20% of all rows — the celebrity-user / null-ish-default shape) and
joins it to a 10k-key dimension, comparing:

  plain     sort-merge join, AQE off           (the skew victim)
  aqe_skew  sort-merge join, AQE skew-split on (runtime mitigation)
  salted    operators/skew.salted_join         (planned mitigation)

Broadcast is disabled (autoBroadcastJoinThreshold=-1) to force the shuffle
join the comparison is about — at production scale the right side may be
far beyond broadcast size. The AQE skew thresholds are lowered so the
splitter fires at local data sizes (defaults target 256 MB partitions).
Sink is a noop write (SURVEY §9: count() is not a benchmark sink).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from udlang_spark.operators.skew import salted_join

HOT_FRACTION = 5  # 1/5 of rows = 20% land on the hot key
N_KEYS = 10_000


def build_inputs(spark, sf_dir, factor: int):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # replicate to `factor`× so the hot key's fan-in is a real single-
    # reducer bottleneck at local scale (sf0.1 alone is too small to bind)
    li = li.withColumn(
        "_rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    # deterministic 20% hot key: md5-bucket the row identity (no rand() —
    # stable across retries), hot rows collapse onto key 0
    ident = F.concat_ws(":", "l_orderkey", "l_linenumber", "_rep")
    hot = F.conv(F.substring(F.md5(ident), 1, 4), 16, 10).cast("long") % HOT_FRACTION == 0
    fact = li.select(
        F.when(hot, F.lit(0))
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        F.col("l_quantity").cast("double").alias("qty"),
        *(
            [F.md5(ident).alias("pad")]  # byte weight for the shuffle
            if os.environ.get("SKEW_PAD", "1") == "1"
            else []
        ),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    return fact, dim


def run_case(spark, fact, dim, mode: str) -> float:
    conf = spark.conf
    if mode == "plain":
        conf.set("spark.sql.adaptive.enabled", "false")
    elif mode == "aqe_skew":
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    elif mode == "salted":
        conf.set("spark.sql.adaptive.enabled", "false")
    else:
        raise ValueError(mode)

    if mode == "salted":
        joined = salted_join(fact, dim, "k", n_salts=16)
    else:
        joined = fact.join(dim, "k")
    out = joined.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qty").alias("s")
    )
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    factor = int(os.environ.get("SKEW_FACTOR", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build_inputs(spark, sf_dir, factor)
    fact = fact.localCheckpoint(eager=True)  # freeze inputs out of the timing
    dim = dim.localCheckpoint(eager=True)

    results: dict[str, float] = {}
    for mode in ("plain", "aqe_skew", "salted"):
        run_case(spark, fact, dim, mode)  # warmup (codegen)
        results[mode] = min(run_case(spark, fact, dim, mode) for _ in range(2))
    n = fact.count()
    hot = fact.filter(F.col("k") == 0).count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "factor": factor,
                "rows": n,
                "hot_key_share": round(hot / n, 4),
                "seconds": {k: round(v, 3) for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
