"""Global sequence assignment: contiguous row numbers 1..N in a total order
WITHOUT a single-partition global sort.

The naive Spark spelling — row_number() over Window.orderBy(...) with no
partitionBy — collapses the whole dataset into ONE task: the exact
anti-pattern at 100 TB. The scalable rewrite here:

1. repartitionByRange(order_cols) + sortWithinPartitions — one range
   shuffle; partitions are disjoint, ordered spans of the total order.
2. mapInPandas with a per-partition running counter — the iterator API
   sees every Arrow batch of its partition in sorted order, so a local
   0-based index costs zero extra passes and zero extra state.
3. per-partition counts → cumulative offsets (a window over ≤ #partitions
   rows — trivially small at any scale) broadcast back and added map-side.

Total cost: ONE wide exchange + a count-aggregate that reuses the same
shuffle files + a broadcast of #partitions rows. The reference has no
analog (single-threaded, src/vm.rs:359-363); this is the engine-extension
path for "stamp every record with a stable ordinal" (pretraining sample
ids, deterministic sharding).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "seq"
) -> DataFrame:
    """Assign contiguous 1..N ids in the total order of `order_cols`
    (which must be a total order — include a unique tiebreak column).
    """
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    # fresh StructType — StructType.add MUTATES the receiver, and df.schema
    # is a cached object: appending to it in place poisons with_pid's own
    # resolved schema.
    schema = StructType(
        list(with_pid.schema.fields) + [StructField("_local_idx", LongType(), False)]
    )

    def add_local_idx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one counter per partition: the iterator yields this partition's
        # batches in sortWithinPartitions order, so the index is the
        # partition-local rank.
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_local_idx"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    indexed = with_pid.mapInPandas(add_local_idx, schema=schema)

    counts = with_pid.groupBy("_pid").count()
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
