"""Parquet table sources for the driver's TPC-H-ish testdata.

The reference reads records from a unix pipe (udlang HACKING.md:127-140,
stdin/stdout only); file connectors are an engine extension (SURVEY.md §2.1).
Here the batch source is parquet via ``spark.read`` — filter pushdown and
column pruning reach the scan for free, which is the load-bearing property at
100 TB (verified via .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the TPC-H
# generator produces (region/nation are constant-size; supplier/part/customer
# grow with SF but stay dimension-like vs. lineitem/orders facts).
BROADCAST_SAFE = {"region", "nation", "supplier"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark refuses to
        # read natively; read nanos as long (session-settable legacy conf) and
        # floor-truncate to microseconds (integer div — double division would
        # round, since ns epoch values exceed 2^53). DuckDB's ns→µs cast also
        # truncates, so both engines see identical timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
