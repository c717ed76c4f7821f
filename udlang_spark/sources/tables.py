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

# A parquet file is split at row-group granularity: the driver's testdata
# writes ONE row group per table, so every scan — and everything narrow
# above it — runs as a single task, even on local[32]. Measured tradeoff
# (sf0.1, steady-state): shuffle-bound queries (groupBy/join) do NOT benefit
# from pre-spreading the scan — their first key shuffle already
# parallelizes, and a blanket repartition of full rows costs more than the
# serial partial-agg it saves (q03: 0.9 s → 1.6 s WITH fan-out). Only
# CPU-heavy per-row operators (shingling, simhash, n-gram explodes) win big
# (d_simhash: 2.1 s → 0.8 s), so fan-out is an explicit opt-in at those
# call sites, never automatic at load. At real scale inputs have thousands
# of splits, the `partitions < target` gate is never true, and fan_out
# vanishes from the plan (the durable fix there is compaction at ingest).


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition a DataFrame whose lineage has fewer partitions than the
    cluster has cores — used by CPU-heavy per-row operators (shingling,
    fingerprinting) where even a small table is a lot of work. No-op when
    the input is already parallel enough (the 100 TB case)."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as INT64 TIMESTAMP(NANOS) in some testdata
        # generations and TIMESTAMP(MICROS) in others; normalize both to
        # TimestampType so downstream epoch-second casts (ts.cast("long"))
        # resolve. Nanos: read as long (session-settable legacy conf) and
        # floor-truncate to µs (integer div — double division would round,
        # since ns epoch values exceed 2^53; DuckDB's ns→µs cast truncates
        # the same). Micros: parquet reads as TIMESTAMP_NTZ, which the UTC
        # session timezone makes value-identical under a plain cast.
        # CAVEAT: the conf is session-global and stays set (restoring it
        # after this lazy read would re-resolve the scan under the restored
        # value) — any OTHER table with INT64(NANOS) columns read after
        # events will also surface them as longs. None of this repo's
        # tables besides events carry nanos columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def table_fingerprint(sf_dir: str, *names: str) -> str:
    """Content fingerprint of source tables for derived-artifact cache
    keys (streaming replay dirs, persisted ANN indexes, bucketed-table
    caches): path + size + mtime_ns of every underlying file. A cache
    keyed ONLY on sf_dir goes silently stale when the data under the
    same path is regenerated — the fingerprint makes regeneration a
    cache miss, so every derived artifact is rebuilt from the data it
    claims to represent."""
    import hashlib
    import os

    parts: list[str] = []
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            files = sorted(
                os.path.join(r, f)
                for r, _d, fs in os.walk(path)
                for f in fs
                if not f.startswith((".", "_"))
            )
        elif os.path.exists(path):
            files = [path]
        else:
            files = []
        for f in files:
            st = os.stat(f)
            parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]
