"""Table compaction: rewrite a parquet dataset into size-targeted files.

The durable fix for pathological input layout (the driver's testdata writes
ONE row group per table; real lakes accumulate thousands of tiny files from
streaming ingests). Both extremes hurt: one giant row group serializes every
scan into a single task; millions of tiny files drown the scheduler in task
overhead and the namenode/listing in metadata. Compaction rewrites to
~target-sized files so scans parallelize at row-group granularity — after
which `fan_out` (sources/tables.py) is a structural no-op.

At 100 TB this runs as a periodic maintenance job per partition of the
table (compact only partitions whose file-size histogram is bad), not as a
full rewrite; the helper takes an optional `partition_by` so the rewrite
preserves/creates partition pruning.

The reference has no file storage at all (pipe stdin/stdout only,
HACKING.md:127-140) — this is engine-extension surface (SURVEY.md §2.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # the classic HDFS/row-group sweet spot


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(input_bytes: int, target_bytes: int = TARGET_FILE_BYTES) -> int:
    """Number of output files: ceil(input/target), floor 1. Parquet re-
    encodes with its own compression, so input bytes are only an estimate —
    good enough for sizing; exactness does not matter here."""
    return max(1, -(-input_bytes // target_bytes))


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = TARGET_FILE_BYTES,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Rewrite `in_path` (parquet file or dataset dir) to `out_path` as
    `plan_file_count` files of ~target_bytes. Returns the file count.

    repartition (round-robin), not coalesce: coalesce(n) with n above the
    current partition count is a no-op, so a single-row-group input would
    still produce one file; round-robin also evens out skewed input files.
    """
    df = spark.read.parquet(in_path)
    n = plan_file_count(_dir_bytes(in_path), target_bytes)
    if partition_by:
        # repartition on the partition columns so each output partition is
        # written by few tasks (fewer, bigger files). NOTE: with
        # partition_by the total FILE count is up to n × distinct keys per
        # task — the returned n is the task count, not a file count.
        rep = df.repartition(n, *partition_by)
    else:
        rep = df.repartition(n)
    writer = rep.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    return n
