"""Streaming queries for the driver contract (SURVEY.md §2.8). Structured
Streaming results are not SQL-expressible for the DuckDB oracle, so these
are rows-only checks — but each has a batch twin in the registry whose
results they must equal (enforced by tests/test_streaming.py).

Each query materializes a bounded file stream from the sf_dir events table
(JSON replay), runs the streaming plan with availableNow, and returns the
drained result as a (batch) DataFrame.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udlang_spark.kernel import ast
from udlang_spark.kernel.api import compile_kernel
from udlang_spark.sources import json_lift
from udlang_spark.sources.tables import load_table
from udlang_spark.streaming import runner

_EVENT_T = ast.TRecord(
    (
        ast.TRecordField("event_id", ast.T_INT),
        ast.TRecordField("event_type", ast.T_STR),
        ast.TRecordField("value", ast.T_FLOAT),
    )
)

_DOUBLER = """
version 0.1-pre_mvp;
script "stream doubler";
input Float;
output Float;
if (in > 100.0) {
  out in * 2.0;
}
"""


def _replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write events rows as JSON files for a replayable file stream."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    tmp = os.path.join(tempfile.gettempdir(), f"udlang_stream_replay_{tag}")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp, ignore_errors=True)
    ev = load_table(spark, "events", sf_dir)
    json_lift.lower_json(
        ev.select("event_id", "event_type", "value"),
        ("event_id", "event_type", "value"),
    ).select("json").coalesce(4).write.mode("overwrite").text(tmp)
    return tmp


def _stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = json_lift.input_schema(_EVENT_T)
    return (
        spark.readStream.schema(schema)
        .option("mode", "FAILFAST")
        .json(_replay_dir(spark, sf_dir))
    )


def s_kernel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless kernel on a stream: same compiled Column expressions as the
    batch path (kernels are stateless by construction — manual.md:21-24)."""
    k = compile_kernel(_DOUBLER)
    out = runner.kernel_stream(
        k, _stream(spark, sf_dir), input_col="value", keep=("event_id",)
    )
    return runner.run_stream_to_memory(out, "q_s_kernel_stream", spark).select(
        "event_id", "out"
    )


def s_windowed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation on the replayed stream."""
    src = _stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id") * 60)
    )
    res = runner.windowed_agg_stream(
        src, "ts", window="1 hour", watermark="2 hours",
        group_cols=("event_type",), aggs={"value": "sum"},
    )
    out = runner.run_windowed_stream_to_memory(res, "q_s_windowed_stream", spark)
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def s_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key running
    totals persisted in the state store across micro-batches. Returns the
    final per-key state (update-mode rows with the largest n per key)."""
    src = _stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id") * 60)
    ).withColumn("bucket", F.col("event_id") % 7)
    res = runner.stateful_running_totals(
        src, key_col="bucket", value_col="value", ts_col="ts"
    )
    out = runner.run_stream_to_memory(
        res, "q_s_stateful_totals", spark, output_mode="update"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("key").orderBy(F.col("n").desc())
    return (
        out.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("key", "n", F.round("total", 6).alias("total"))
    )


def s_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join: click events joined to purchase
    events on a shared key, purchase within 1 hour after the click. Both
    sides derive from the same replayed file stream; result rows are exactly
    the batch join's (stream-stream inner join emits every matching pair),
    so the output is deterministic despite the streaming execution."""
    src = _stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id") * 60)
    ).withColumn("ukey", F.col("event_id") % 13)
    clicks = src.filter(F.col("event_type") == "click").select(
        "ukey", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = src.filter(F.col("event_type") == "purchase").select(
        "ukey",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    joined = runner.stream_stream_join(
        clicks,
        purchases,
        key_col="ukey",
        left_ts="click_ts",
        right_ts="purchase_ts",
        watermark="2 hours",
        within="1 hour",
    )
    out = runner.run_stream_to_memory(joined, "q_s_stream_join", spark)
    return out.select(
        "jkey",
        F.col("l_click_id").alias("click_id"),
        F.col("r_purchase_id").alias("purchase_id"),
        F.round("r_value", 6).alias("purchase_value"),
    )


def s_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark): first event
    per (event_type, bucket) key. Which row is 'first' is racy across
    micro-batch partitions, so the contract output is the deterministic part
    only: the distinct key set that survives."""
    src = _stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id") * 60)
    ).withColumn("bucket", F.col("event_id") % 50)
    deduped = runner.streaming_dedup(
        src, ("event_type", "bucket"), "ts", watermark="2 hours"
    )
    out = runner.run_stream_to_memory(deduped, "q_s_dedup_stream", spark)
    return out.select("event_type", "bucket").orderBy("event_type", "bucket")


def s_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation on the replayed stream: events within 10
    minutes of each other merge per event_type; the watermark closes
    sessions and bounds state."""
    src = _stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id") * 60)
    )
    res = runner.session_window_stream(
        src, "ts", gap="10 minutes", watermark="2 hours",
        group_cols=("event_type",), aggs={"value": "sum"},
    )
    out = runner.run_windowed_stream_to_memory(res, "q_s_session_stream", spark)
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def s_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE (CDC apply) via foreachBatch into a keyed parquet
    target — the streaming twin of q34_upsert. The merge is seq-aware
    latest-wins, so the final table is a pure function of the change set
    regardless of micro-batch boundaries or replay: ORACLE-CHECKABLE,
    unlike the other streaming entries."""
    src = _stream(spark, sf_dir).select(
        (F.col("event_id") % 100).alias("k"),
        F.col("value").alias("v"),
        F.col("event_id").alias("seq"),
    )
    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"udlang_cdc_target_{tag}")
    ckpt = os.path.join(tempfile.gettempdir(), f"udlang_cdc_ckpt_{tag}")
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    runner.run_cdc_apply_stream(
        spark, src, target, ckpt, key="k", seq_col="seq"
    )
    return spark.read.parquet(target).orderBy("k")


ORACLE_CDC_APPLY = """
SELECT event_id % 100 AS k, value AS v, event_id AS seq
FROM events
QUALIFY row_number() OVER (PARTITION BY event_id % 100
                           ORDER BY event_id DESC) = 1
ORDER BY k
"""


QUERIES = {
    "s_kernel_stream": s_kernel_stream,
    "s_windowed_stream": s_windowed_stream,
    "s_stateful_totals": s_stateful_totals,
    "s_stream_join": s_stream_join,
    "s_dedup_stream": s_dedup_stream,
    "s_session_stream": s_session_stream,
    "s_cdc_apply": s_cdc_apply,
}

# Structured Streaming execution is mostly not SQL-expressible — rows-only
# checks with batch equivalence pytest-enforced instead
# (tests/test_streaming.py). Exception: the CDC apply's seq-aware merge
# makes its final table a pure function of the change set, so it carries a
# real DuckDB oracle.
ORACLE: dict[str, str] = {
    "s_cdc_apply": ORACLE_CDC_APPLY,
}
