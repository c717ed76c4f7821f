"""Differential correctness vs. DuckDB for corpus-cleaning queries at sf0.01,
plus semantic spot-checks that the rules bite the way the papers describe."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare
from udlang_spark.queries import cleaning


@pytest.mark.parametrize("name", sorted(cleaning.ORACLE))
def test_cleaning_query_matches_oracle(spark, duck, name):
    compare(
        spark,
        duck,
        name,
        cleaning.QUERIES[name],
        cleaning.ORACLE[name],
        SF_DIR_CORRECTNESS,
    )


def test_wordpiece_plan_cache_evicted(spark):
    """r14: t_wordpiece's r13 plan cache was EVICTED (r13 VERDICT #1 —
    its vocab derivation is a per-run corpus aggregation + collect).
    Every call must construct a FRESH plan (re-deriving the vocab) and
    produce identical rows; the shared-tokenization r14 rewrite inside
    wordpiece_stats must not change a single value."""
    from udlang_spark.session import release_caches

    q = cleaning.QUERIES["t_wordpiece"]
    a = q(spark, SF_DIR_CORRECTNESS)
    rows_a = sorted(map(tuple, a.collect()))
    release_caches()
    b = q(spark, SF_DIR_CORRECTNESS)
    assert b is not a, "t_wordpiece must not memoise its plan across calls"
    assert rows_a == sorted(map(tuple, b.collect()))
    assert len(rows_a) > 0
    release_caches()


def test_gopher_rules_consistent(spark):
    # every failed_rule value is one of the documented rules, and
    # keep == (failed_rule IS NULL) on every row
    from pyspark.sql import functions as F

    out = cleaning.t_gopher_rules(spark, SF_DIR_CORRECTNESS)
    bad = out.where(
        ~F.col("failed_rule").isin(
            "word_count", "mean_word_len", "alpha_frac", "stopwords"
        )
        & F.col("failed_rule").isNotNull()
    ).count()
    assert bad == 0
    mismatch = out.where(
        F.col("keep") != F.col("failed_rule").isNull()
    ).count()
    assert mismatch == 0


def test_dedup_words_collapses_runs(spark):
    out = {
        r["doc_id"]: r
        for r in cleaning.t_dedup_words(spark, SF_DIR_CORRECTNESS).collect()
    }
    # every doc: kept + removed == total, kept >= 1 for non-empty docs
    for r in out.values():
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"]
        if r["n_tokens"] > 0:
            assert r["n_kept"] >= 1


def test_duplicate_spans_symmetry(spark):
    # a gram counted as duplicated for doc A must make >= one other doc
    # also carry a duplicated gram — so the number of docs with
    # n_dup_grams > 0 is never exactly 1
    df = cleaning.d_duplicate_spans(spark, SF_DIR_CORRECTNESS)
    n_flagged = df.where("n_dup_grams > 0").count()
    assert n_flagged != 1


def test_wordpiece_fertility_bounds(spark):
    # 1 <= n_subwords per word <= word length; fertility must respect both
    from pyspark.sql import functions as F

    df = cleaning.t_wordpiece(spark, SF_DIR_CORRECTNESS)
    assert df.where((F.col("n_words") > 0) & (F.col("fertility") < 1.0)).count() == 0
    assert df.where(F.col("n_subwords") < F.col("n_words")).count() == 0


def test_line_dedup_removes_shared_lines_everywhere(spark):
    """Constructed corpus: a 3-word line shared by 5 docs is boilerplate
    and must vanish from ALL of them (no keeper); a line shared by only 4
    docs survives; empty docs come back as 0/0/md5('')."""
    import hashlib

    from udlang_spark.operators import cleaning as OPS

    boiler = "cookie banner text"
    rare = "shared by four"
    rows = [(i, f"{boiler} unique tail {i}") for i in range(5)]
    rows += [(10 + i, f"{rare} other words {i}") for i in range(4)]
    rows.append((99, ""))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in OPS.remove_boilerplate_lines(
            docs, line_words=3, min_docs=5
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    for i in range(5):
        r = got[i]
        # doc = "cookie banner text" + "unique tail {i}" -> 2 lines, 1 kept
        assert (r["n_lines"], r["n_kept"], r["n_removed"]) == (2, 1, 1)
        assert r["cleaned_md5"] == md5(f"unique tail {i}")
    for i in range(4):
        r = got[10 + i]
        assert (r["n_lines"], r["n_kept"], r["n_removed"]) == (2, 2, 0)
        assert r["cleaned_md5"] == md5(f"{rare} other words {i}")
    assert (got[99]["n_lines"], got[99]["n_kept"]) == (0, 0)
    assert got[99]["cleaned_md5"] == md5("")


def test_length_outliers_flags_only_extreme_docs(spark):
    """Constructed strata: 10 ten-token docs plus one 200-token doc (z =
    sqrt(10) > 3) flags exactly the long doc 'high'; a uniform stratum and
    a mildly-varying stratum flag nothing (integer algebra: zero-variance
    and small-sample deviations fail the strict inequality)."""
    from udlang_spark.queries import cleaning as Q

    rows = [(i, "en", "a", "w " * 10) for i in range(10)]
    rows.append((99, "en", "a", "w " * 200))
    rows += [(200 + i, "en", "b", "w " * 7) for i in range(6)]  # uniform
    rows += [(300 + i, "en", "c", "w " * (i + 1)) for i in range(5)]  # mild
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    got = Q.length_outliers(docs).select("doc_id", "side").collect()
    assert [(r["doc_id"], r["side"]) for r in got] == [(99, "high")]
