"""Differential correctness vs. DuckDB for LLM-pipeline queries at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare
from udlang_spark.queries import llm


@pytest.mark.parametrize("name", sorted(llm.ORACLE))
def test_llm_query_matches_oracle(spark, duck, name):
    compare(
        spark,
        duck,
        name,
        llm.QUERIES[name],
        llm.ORACLE[name],
        SF_DIR_CORRECTNESS,
    )


def test_minhash_finds_planted_near_dups(spark):
    # the testdata contains ~25 pairs with jaccard >= 0.9; LSH with 4 bands
    # of 2 rows catches a >= 0.9 pair with prob 1-(1-0.81)^4 ≈ 99.9%
    rows = llm.QUERIES["d_minhash_lsh"](spark, SF_DIR_CORRECTNESS).collect()
    assert len(rows) >= 20
    assert all(r.jaccard >= 0.8 for r in rows)


def test_ann_recall_vs_brute_force(spark):
    exact = {
        (r.vec_id, r.nbr)
        for r in llm.QUERIES["e_cosine_topk"](spark, SF_DIR_CORRECTNESS).collect()
        if r.rnk <= 3
    }
    approx = {
        (r.vec_id, r.nbr)
        for r in llm.QUERIES["e_ann_lsh"](spark, SF_DIR_CORRECTNESS).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.3, f"ANN recall too low: {recall:.2f}"


def test_image_decode_deterministic(spark):
    df = llm.QUERIES["m_image_meta"](spark, SF_DIR_CORRECTNESS)
    rows1 = {r.doc_id: (r.width, r.height, r.channels) for r in df.collect()}
    rows2 = {r.doc_id: (r.width, r.height, r.channels) for r in df.collect()}
    assert rows1 == rows2
    assert all(1 <= w <= 64 and 1 <= h <= 64 and c == 3 for w, h, c in rows1.values())


def test_real_decode_raises(spark):
    from udlang_spark.operators import multimodal
    from udlang_spark.sources.tables import load_table

    docs = multimodal.attach_payload(load_table(spark, "documents", SF_DIR_CORRECTNESS))
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        multimodal.decode_images(docs, decode_mode="real").collect()


def test_frame_sampling_shape(spark):
    from udlang_spark.operators import multimodal
    from udlang_spark.sources.tables import load_table

    docs = multimodal.attach_payload(load_table(spark, "documents", SF_DIR_CORRECTNESS))
    frames = multimodal.sample_frames(docs, n_frames=3)
    got = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_ivf_recall_vs_brute_force(spark):
    """IVF with n_probe=6 of 16 cells should recover most true neighbors;
    n_probe=n_cells would be exact."""
    exact = {
        (r.vec_id, r.nbr)
        for r in llm.QUERIES["e_cosine_topk"](spark, SF_DIR_CORRECTNESS).collect()
        if r.rnk <= 3
    }
    approx = {
        (r.vec_id, r.nbr)
        for r in llm.QUERIES["e_ivf_ann"](spark, SF_DIR_CORRECTNESS).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.5, f"IVF recall too low: {recall:.2f}"


def test_scrub_removes_urls_and_emails(spark):
    """clean_text scrub on crafted rows (the driver corpus has no URLs, so
    this is pytest- rather than oracle-checked)."""
    from udlang_spark.functions import text as TXT

    df = spark.createDataFrame(
        [
            ("see https://example.com/x?q=1 and mail bob@corp.io  now",),
            ("no noise   here",),
            ("two urls http://a.io https://b.io and a@b.co c@d.org",),
        ],
        "text string",
    )
    rows = df.select(*TXT.scrub("text")).collect()
    assert rows[0].cleaned == "see and mail now"
    assert (rows[0].n_urls, rows[0].n_emails) == (1, 1)
    assert rows[1].cleaned == "no noise here"
    assert (rows[1].n_urls, rows[1].n_emails) == (0, 0)
    assert rows[2].cleaned == "two urls and"
    assert (rows[2].n_urls, rows[2].n_emails) == (2, 2)
