"""File-format connectors: typed schemas + invalid-record policies
(SURVEY.md §2.1)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from tests.conftest import SF_DIR_SMOKE
from udlang_spark.kernel import ast
from udlang_spark.sources import formats
from udlang_spark.sources.tables import load_table

RECORD_T = ast.TRecord(
    (
        ast.TRecordField("event_id", ast.T_INT),
        ast.TRecordField("event_type", ast.T_STR),
        ast.TRecordField("value", ast.T_FLOAT),
    )
)


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="udlang_formats_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip(spark, tmpdir):
    ev = load_table(spark, "events", SF_DIR_SMOKE).select(
        "event_id", "event_type", "value"
    )
    formats.write_csv(ev, f"{tmpdir}/ev_csv")
    back = formats.read_csv(spark, f"{tmpdir}/ev_csv", RECORD_T)
    assert back.schema["event_id"].dataType.typeName() == "long"
    orig = {(r.event_id, r.event_type, r.value) for r in ev.collect()}
    got = {(r.event_id, r.event_type, r.value) for r in back.collect()}
    assert orig == got


def test_csv_policies(spark, tmpdir):
    # one malformed line among valid ones
    with open(f"{tmpdir}/bad.csv", "w") as f:
        f.write("event_id,event_type,value\n1,click,2.5\nnot_an_int,x,y\n2,view,1.0\n")
    ok = formats.read_csv(spark, f"{tmpdir}/bad.csv", RECORD_T, policy="ignore")
    assert sorted(r.event_id for r in ok.collect()) == [1, 2]

    warn = formats.read_csv(spark, f"{tmpdir}/bad.csv", RECORD_T, policy="warn")
    rows = warn.collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r._corrupt is not None) == 1

    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        formats.read_csv(spark, f"{tmpdir}/bad.csv", RECORD_T, policy="abort").collect()


def test_json_roundtrip(spark, tmpdir):
    ev = load_table(spark, "events", SF_DIR_SMOKE).select(
        "event_id", "event_type", "value"
    )
    formats.write_json(ev, f"{tmpdir}/ev_json")
    back = formats.read_json(spark, f"{tmpdir}/ev_json", RECORD_T)
    assert back.count() == ev.count()


def test_parquet_typed_projection(spark, tmpdir):
    ev = load_table(spark, "events", SF_DIR_SMOKE)
    formats.write_parquet(ev.select("event_id", "event_type", "value"), f"{tmpdir}/ev_pq")
    back = formats.read_parquet(spark, f"{tmpdir}/ev_pq", RECORD_T)
    assert [f.name for f in back.schema.fields] == ["event_id", "event_type", "value"]
    # missing declared field -> error (abort-on-mismatch posture)
    with pytest.raises(ValueError, match="lacks declared fields"):
        narrow = ast.TRecord((ast.TRecordField("nope", ast.T_INT),))
        formats.read_parquet(spark, f"{tmpdir}/ev_pq", narrow)


def test_msgpack_stub():
    with pytest.raises(NotImplementedError):
        formats.read_msgpack(None, "x", RECORD_T)


def test_compaction_resizes_and_preserves_rows(spark, tmp_path):
    """compact() rewrites a one-row-group table into size-targeted files;
    row content survives and the new layout scans as multiple splits."""
    from udlang_spark.sources import compaction
    from udlang_spark.sources.tables import load_table

    src = "/root/testdata/sf0.01/lineitem.parquet"
    out = str(tmp_path / "lineitem_compact")
    # ~1.1 MB input, 128 KB target → ~9 files
    n = compaction.compact(spark, src, out, target_bytes=128 * 1024)
    assert n > 1

    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n

    orig = spark.read.parquet(src)
    comp = spark.read.parquet(out)
    assert comp.count() == orig.count()
    assert set(comp.columns) == set(orig.columns)
    # the rewritten layout parallelizes the scan
    assert comp.rdd.getNumPartitions() > 1


def test_compaction_partitioned_layout(spark, tmp_path):
    from udlang_spark.sources import compaction

    src = "/root/testdata/sf0.01/orders.parquet"
    out = str(tmp_path / "orders_by_status")
    compaction.compact(
        spark, src, out, target_bytes=256 * 1024, partition_by=("o_orderstatus",)
    )
    import os

    subdirs = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(subdirs) >= 2
    # partition pruning: reading one status touches only its directory
    one = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    orig_f = spark.read.parquet(src).filter("o_orderstatus = 'F'").count()
    assert one.count() == orig_f
