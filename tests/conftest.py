from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udlang_spark.session import get_spark

SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"
SF_DIR_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("udlang_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from udlang_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR_CORRECTNESS}/{t}.parquet')"
        )
    yield con
    con.close()
