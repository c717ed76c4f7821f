"""Differential correctness vs. DuckDB for kernel queries at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare
from udlang_spark.queries import kernels


@pytest.mark.parametrize("name", sorted(kernels.QUERIES))
def test_kernel_query_matches_oracle(spark, duck, name):
    compare(
        spark,
        duck,
        name,
        kernels.QUERIES[name],
        kernels.ORACLE[name],
        SF_DIR_CORRECTNESS,
    )
