"""Differential correctness vs. DuckDB oracle for every relational query
(SURVEY.md §5 test strategy: oracle hash-match on sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare
from udlang_spark.queries import relational


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(spark, duck, name):
    if name not in relational.ORACLE:
        # rows-only entries (engine-specific sketch internals) carry their
        # own dedicated assertions instead — see test_q53_sketch_error_bounds
        rows = relational.QUERIES[name](spark, SF_DIR_CORRECTNESS).collect()
        assert len(rows) >= 0
        return
    compare(
        spark,
        duck,
        name,
        relational.QUERIES[name],
        relational.ORACLE[name],
        SF_DIR_CORRECTNESS,
    )


def test_q67_plan_cache_identity(spark):
    """r13: q67 plan-caches per (session, orders+lineitem fingerprint) —
    the persisted-index-probe idiom applied to the bloom ledger, whose
    per-call construction is a dim-count sizing job + the bloom-build
    collect + analysis of the binary-literal plan. Same (session,
    sources) must return the SAME DataFrame object; clearing the cache
    returns a fresh plan with identical rows, proving the cache only
    amortizes construction, never changes what is computed."""
    from udlang_spark.session import plan_cache, release_caches

    plan_cache.clear()
    release_caches()
    q = relational.QUERIES["q67_bloom_prune"]
    a = q(spark, SF_DIR_CORRECTNESS)
    b = q(spark, SF_DIR_CORRECTNESS)
    assert a is b
    rows_a = sorted(map(tuple, a.collect()))
    plan_cache.clear()
    release_caches()
    c = q(spark, SF_DIR_CORRECTNESS)
    assert c is not a
    assert rows_a == sorted(map(tuple, c.collect()))
    assert len(rows_a) > 0


def test_q53_sketch_error_bounds(spark):
    """The sketch forms (HLL++ distinct, approx percentile) must track
    their exact twins within tight bounds — the contract that justifies
    swapping them in at 100 TB (SURVEY.md §9). The query emits the bound
    checks as booleans (so the driver oracle can assert them too); this
    test pins them all TRUE."""
    rows = relational.QUERIES["q53_sketch_stats"](spark, SF_DIR_CORRECTNESS).collect()
    assert rows
    for r in rows:
        assert r["approx_orders_ok"], r
        assert r["approx_p50_ok"], r
