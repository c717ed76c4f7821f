"""Global sequence assignment: contiguous row numbers 1..N in a total order
WITHOUT a single-partition global sort.

The naive Spark spelling — row_number() over Window.orderBy(...) with no
partitionBy — collapses the whole dataset into ONE task: the exact
anti-pattern at 100 TB. The scalable rewrite here:

1. repartitionByRange(order_cols) + sortWithinPartitions — one range
   shuffle; partitions are disjoint, ordered spans of the total order.
2. monotonically_increasing_id() evaluated ABOVE the sort (same stage,
   pipelined) packs `partition_id << 33 | local_counter` — decoding the
   partition id and the 0-based partition-local rank is two bit ops of
   pure codegen. (r14: this replaces a mapInPandas counter pass — the
   whole relation used to cross JVM→Arrow→Python→JVM just to number
   rows; guide §4 eliminate-the-Python-boundary. Values are identical:
   both count rows per partition in sorted order from 0.)
3. per-partition counts → cumulative offsets (a window over ≤ #partitions
   rows — trivially small at any scale) broadcast back and added map-side.

Total cost: ONE wide exchange + a count-aggregate that reuses the same
shuffle files + a broadcast of #partitions rows. The reference has no
analog (single-threaded, src/vm.rs:359-363); this is the engine-extension
path for "stamp every record with a stable ordinal" (pretraining sample
ids, deterministic sharding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "seq"
) -> DataFrame:
    """Assign contiguous 1..N ids in the total order of `order_cols`
    (which must be a total order — include a unique tiebreak column).

    The 33-bit local counter caps a single range partition at 2^33 rows
    (Spark's own monotonically_increasing_id contract); range
    partitioning bounds partition size long before that.
    """
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    # mid = partition_id << 33 | 0-based local counter, assigned in the
    # partition's physical row order — which IS the sorted order here
    # (the projection runs above the sort in the same stage)
    indexed = ranged.withColumn("_mid", F.monotonically_increasing_id()).select(
        *df.columns,
        F.shiftright("_mid", 33).cast("int").alias("_pid"),
        F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)).alias("_local_idx"),
    )

    counts = indexed.groupBy("_pid").count()
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("count").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")

    return (
        indexed.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_local_idx") + 1)
        .drop("_pid", "_local_idx", "_offset")
    )


def shard_plan(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic epoch-shuffle resharding for training data: every row
    gets a shard id and a within-shard order key, both pure salted-md5
    functions of its id — reproducible across retries, engines, and
    cluster sizes (no rand(), no monotonically_increasing_id; change
    `salt` per epoch to get a fresh permutation). The reference has no
    analog; this is the layout step a pre-training pipeline runs between
    cleaning and tokenized-shard writing.

    shard = first 8 md5 hex chars mod n_shards (uniform for ANY id
    distribution — sequential ids, hashes, URLs); okey = the NEXT 12 hex
    chars as a 48-bit int (independent digest bits, so the within-shard
    order is an unbiased shuffle; < 2^53, exact in doubles and summable
    exactly in int64 across billions of rows).

    Scale shape: assignment is pure map-side Column work. MATERIALIZING
    the shards is df.repartition(n_shards, "shard")
    .sortWithinPartitions("okey", id_col).write... — one hash exchange +
    per-partition sorts; NEVER a global orderBy (single-task sort) or a
    per-shard row_number window (one task per shard holding the whole
    shard). Returns the assignment relation (row-level, composable);
    shard_census() is the verification summary."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
        ).alias("shard"),
        F.conv(F.substring(h, 9, 12), 16, 10).cast("long").alias("okey"),
    )


def shard_census(assign: DataFrame, id_col: str) -> DataFrame:
    """Per-shard verification census over a shard_plan assignment: row
    count, exact int64 okey sum (order-free), and an md5 witness of the
    FULL within-shard permutation (ids concatenated in (okey, id) order) —
    pins byte-for-byte that two engines/runs produce the identical
    shuffle. The permutation witness collects one shard per row
    (collect_list bounded by shard size — a diagnostic run at sampled
    scale; production trusts sortWithinPartitions and verifies counts +
    sums, which stay O(1) per shard)."""
    ordered_ids = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("okey"), F.col(id_col).alias("i")))
        ),
        lambda x: x["i"].cast("string"),
    )
    return assign.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("okey").alias("okey_sum"),
        F.md5(F.concat_ws(",", ordered_ids)).alias("perm_md5"),
    )
