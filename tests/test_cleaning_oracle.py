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
