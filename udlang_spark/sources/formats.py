"""File-format connectors with uDLang-typed schemas (SURVEY.md §2.1 —
file formats are engine extensions; the reference reads stdin pipes only,
HACKING.md:127-140).

Every reader takes a kernel input type (ast.Type) and the documented
invalid-record policy (manual.md:45-49): abort → FAILFAST,
ignore → DROPMALFORMED, warn → PERMISSIVE (+ `_corrupt` column).
Parquet is schema-enforced by the format itself, so the policy applies to
the text formats (csv/json).

msgpack framing (the reference's planned wire format, README.md:53-61) is
stubbed: the container has no msgpack library, so `read_msgpack` raises
NotImplementedError with the intended contract documented. The Spark-side
plumbing (schema derivation, binary-file ingestion shape) is real.

Scale notes: csv/json scans parallelize per file-split; parquet adds
predicate pushdown + column pruning (always prefer it for 100 TB);
`maxPartitionBytes` sizes splits to executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from udlang_spark.kernel import ast
from udlang_spark.sources.json_lift import POLICY_TO_MODE, input_schema


def read_csv(
    spark: SparkSession,
    path: str,
    input_type: ast.Type,
    policy: str = "abort",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV → typed DataFrame matching the kernel's declared input shape."""
    if policy not in POLICY_TO_MODE:
        raise ValueError(f"unknown policy {policy!r} (abort|ignore|warn)")
    schema = input_schema(input_type)
    if policy == "warn":
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt", StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", POLICY_TO_MODE[policy])
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_json(
    spark: SparkSession, path: str, input_type: ast.Type, policy: str = "abort"
) -> DataFrame:
    """JSON-lines → typed DataFrame (file twin of json_lift.lift_json)."""
    if policy not in POLICY_TO_MODE:
        raise ValueError(f"unknown policy {policy!r} (abort|ignore|warn)")
    schema = input_schema(input_type)
    if policy == "warn":
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt", StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", POLICY_TO_MODE[policy])
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_parquet(
    spark: SparkSession, path: str, input_type: ast.Type | None = None
) -> DataFrame:
    """Parquet scan; when an input type is given, project/validate to it
    (schema enforcement at ingest — the reference's abort-on-mismatch
    posture, manual.md:47-49)."""
    df = spark.read.parquet(path)
    if input_type is not None:
        want = input_schema(input_type)
        missing = [f.name for f in want.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"parquet at {path} lacks declared fields {missing}")
        from pyspark.sql import functions as F

        df = df.select(
            *[F.col(f.name).cast(f.dataType) for f in want.fields]
        )
    return df


def write_parquet(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_msgpack(spark: SparkSession, path: str, input_type: ast.Type) -> DataFrame:
    """STUB — msgpack framing (the reference's planned wire format,
    README.md:53-61, explicitly TBD at README.md:96). Intended contract:
    `spark.read.format('binaryFile')` per frame-file → mapInPandas decode
    with a msgpack library → rows matching input_schema(input_type). The
    container ships no msgpack codec, so this raises until one is
    available."""
    raise NotImplementedError(
        "msgpack framing needs a msgpack codec (not in this environment); "
        "use read_json/read_parquet — the kernel is format-agnostic"
    )
