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


def test_debug_operator_taps(spark):
    """`!expr` (manual.md:54-62): value passes through unchanged; with
    apply(debug=True) the tapped values surface as a _debug string array."""
    from udlang_spark.kernel.api import compile_kernel

    k = compile_kernel(
        """
version 0.1-pre_mvp;
script "debug taps";
input Int;
output Int;
let doubled = !(in * 2);
out doubled + 1;
"""
    )
    df = spark.createDataFrame([(5,), (10,)], "value long")
    plain = sorted(r[0] for r in k.apply(df, input_col="value").collect())
    assert plain == [11, 21]  # pass-through: same results without debug
    rows = k.apply(df, input_col="value", debug=True).collect()
    got = sorted((r.out, list(r._debug)) for r in rows)
    assert got == [(11, ["10"]), (21, ["20"])]
