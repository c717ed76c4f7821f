"""Structured Streaming execution for kernels and windowed aggregations.

uDLang kernels are stateless by construction (manual.md:21-24: the
environment exposes no mutable state), so every compiled kernel is
streaming-safe: the same Column expressions run unchanged under
`spark.readStream` (SURVEY.md §2.8). Stateful processing is explicitly out
of the reference's scope (delegated to a planned driver — README.md:59-61);
here the engine-extension stateful operators are watermarked window
aggregations, the standard Structured Streaming forms.

Scale notes: stateless kernel streams have no state store and trivially
parallelize per partition; windowed aggs keep state bounded by the
watermark horizon; file sources at 100 TB should be replaced by Kafka/queue
sources — the transformations are source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from udlang_spark.kernel.api import Kernel


def kernel_stream(
    kernel: Kernel,
    stream: DataFrame,
    input_col: str | None = None,
    keep: tuple[str, ...] = (),
    out_name: str = "out",
) -> DataFrame:
    """Apply a compiled kernel to a streaming DataFrame. Identical code path
    to batch: Kernel.apply only builds Column expressions."""
    if not stream.isStreaming:
        raise ValueError("kernel_stream expects a streaming DataFrame")
    return kernel.apply(stream, input_col=input_col, keep=keep, out_name=out_name)


def windowed_agg_stream(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation with late-data watermark. In batch mode
    (a non-streaming df) the same expression tree runs without the
    watermark — used by the oracle equivalence tests."""
    exprs = [F.count(F.lit(1)).alias("n_events")]
    for col, fn in (aggs or {}).items():
        exprs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    return src.groupBy(F.window(ts_col, window).alias("w"), *group_cols).agg(*exprs)


def run_stream_to_memory(
    result: DataFrame, query_name: str, spark: SparkSession, timeout_s: int = 60
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table; returns the table.
    Test/debug harness — production sinks are writeStream.format(...)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not result.isStreaming or True else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return spark.table(query_name)


def run_windowed_stream_to_memory(
    result: DataFrame, query_name: str, spark: SparkSession, timeout_s: int = 60
) -> DataFrame:
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return spark.table(query_name)
