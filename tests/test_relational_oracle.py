"""Differential correctness vs. DuckDB oracle for every relational query
(SURVEY.md §5 test strategy: oracle hash-match on sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare
from udlang_spark.queries import relational


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(spark, duck, name):
    compare(
        spark,
        duck,
        name,
        relational.QUERIES[name],
        relational.ORACLE[name],
        SF_DIR_CORRECTNESS,
    )
