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


def test_point_type_kernel(spark):
    """Point (pair of floats — src/ast.rs:177, src/ir.rs:362) lowers to
    struct<x double, y double>; .x/.y project its fields."""
    from udlang_spark.kernel.api import compile_kernel

    k = compile_kernel(
        """
version 0.1-pre_mvp;
script "point norm";
input Point;
output Float;
out in.x * in.x + in.y * in.y;
"""
    )
    df = spark.createDataFrame(
        [((3.0, 4.0),), ((0.0, 0.0),)], "value struct<x: double, y: double>"
    )
    got = sorted(r[0] for r in k.apply(df, input_col="value").collect())
    assert got == [0.0, 25.0]
