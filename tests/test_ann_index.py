"""Persisted IVF index: probe-vs-in-memory equality, partition pruning,
and layout invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_CORRECTNESS
from udlang_spark.operators import ann_index, similarity
from udlang_spark.sources.tables import load_table


def _embeddings(spark):
    return load_table(spark, "embeddings", SF_DIR_CORRECTNESS)


def test_probe_equals_in_memory(spark, tmp_path):
    """A probe against the persisted index returns exactly what
    ivf_ann_topk computes for the same queries/parameters: same centroids,
    same routing, same in-cell GEMM, same merge."""
    emb = _embeddings(spark)
    path = str(tmp_path / "ivf")
    ann_index.write_ivf_index(emb, "embedding", "vec_id", path, n_cells=16)

    queries = emb.where(F.col("vec_id") < 50)
    got = ann_index.probe_ivf_index(
        spark, path, queries, "embedding", "vec_id", k=5, n_probe=4
    )
    want = similarity.ivf_ann_topk(
        emb, "embedding", "vec_id", k=5, n_cells=16, n_probe=4
    ).where(F.col("vec_id") < 50)

    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows
    assert len(got_rows) == 50 * 5


def test_probe_prunes_partitions(spark, tmp_path):
    """The index scan must read ONLY the probed cells' directories —
    partition pruning is what makes the persisted index a serving path.
    inputFiles() on the pruned reader reflects the partition filter."""
    emb = _embeddings(spark)
    path = str(tmp_path / "ivf")
    ann_index.write_ivf_index(emb, "embedding", "vec_id", path, n_cells=16)

    one_query = emb.where(F.col("vec_id") == 7)
    out = ann_index.probe_ivf_index(
        spark, path, one_query, "embedding", "vec_id", k=3, n_probe=2
    )
    assert out.count() == 3

    # replicate the reader the probe builds: 2 probed cells -> at most 2
    # cell directories' files; the unfiltered index has 16
    all_files = spark.read.parquet(path).inputFiles()
    all_cells = {f.split("cell=")[1].split("/")[0] for f in all_files}
    assert len(all_cells) == 16
    import numpy as np

    cent_rows = (
        spark.read.parquet(path + "/_centroids").orderBy("cell").collect()
    )
    cent = np.stack([np.asarray(r["vec"]) for r in cent_rows]).astype(np.float64)
    qv = np.asarray(one_query.collect()[0]["embedding"], dtype=np.float64)
    qc = (cent @ qv) / (np.linalg.norm(cent, axis=1) * np.linalg.norm(qv))
    np.round(qc, 6, out=qc)
    probe_cells = [int(c) for c in np.argsort(-qc, kind="stable")[:2]]
    pruned = spark.read.parquet(path).where(F.col("cell").isin(probe_cells))
    # inputFiles() lists the relation pre-filter; pruning is a PLAN property —
    # the scan must carry the cell IN (...) predicate as a PartitionFilter
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cell" in pf_line and " IN " in pf_line
    assert all(str(c) in pf_line for c in probe_cells)


def test_index_layout_and_rebuild(spark, tmp_path):
    """Overwrite semantics: rebuilding the index over the same data leaves
    one coherent copy (no stale cells), and every member row appears in
    exactly one cell."""
    emb = _embeddings(spark)
    path = str(tmp_path / "ivf")
    ann_index.write_ivf_index(emb, "embedding", "vec_id", path, n_cells=8)
    ann_index.write_ivf_index(emb, "embedding", "vec_id", path, n_cells=8)

    members = spark.read.parquet(path)
    n = emb.count()
    assert members.count() == n
    assert members.select("id").distinct().count() == n
    cents = spark.read.parquet(path + "/_centroids")
    assert cents.count() == 8


def test_append_equals_rebuild(spark, tmp_path):
    """Building on the first 400 vectors then appending the last 100 must
    equal a full rebuild, because the frozen quantizer (first n_cells ids)
    is identical either way — so probes agree bit-for-bit."""
    emb = _embeddings(spark)
    base = emb.where(F.col("vec_id") < 400)
    extra = emb.where(F.col("vec_id") >= 400)

    p_inc = str(tmp_path / "ivf_inc")
    ann_index.write_ivf_index(base, "embedding", "vec_id", p_inc, n_cells=16)
    ann_index.append_to_ivf_index(extra, "embedding", "vec_id", p_inc)

    p_full = str(tmp_path / "ivf_full")
    ann_index.write_ivf_index(emb, "embedding", "vec_id", p_full, n_cells=16)

    queries = emb.where(F.col("vec_id") % 50 == 0)
    got = {
        tuple(r)
        for r in ann_index.probe_ivf_index(
            spark, p_inc, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in ann_index.probe_ivf_index(
            spark, p_full, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    assert got == want and len(got) == queries.count() * 5


def _recall(got, want, qcol_g, ncol_g, qcol_w, ncol_w):
    g, w = {}, {}
    for r in got.collect():
        g.setdefault(r[qcol_g], set()).add(r[ncol_g])
    for r in want.collect():
        w.setdefault(r[qcol_w], set()).add(r[ncol_w])
    hit = sum(len(g.get(q, set()) & w[q]) for q in w)
    return hit / sum(len(w[q]) for q in w)


def test_ivfpq_layout_and_code_parity(spark, tmp_path):
    """The persisted codes must equal pq_encode's output for the same
    codebook (one encode kernel — pq_code_block — on both paths), every
    member lands in exactly one cell, and both sidecars are present."""
    emb = _embeddings(spark)
    path = str(tmp_path / "ivfpq")
    ann_index.write_ivfpq_index(
        emb, "embedding", "vec_id", path, n_cells=16, n_subspaces=4
    )

    codes = spark.read.parquet(path)
    n = emb.count()
    assert codes.count() == n
    assert codes.select("id").distinct().count() == n
    assert {f.name for f in codes.schema.fields} == {
        "cell", "id", "c0", "c1", "c2", "c3",
    }
    assert spark.read.parquet(path + "/_centroids").count() == 16
    assert spark.read.parquet(path + "/_codebook").count() == 16

    want = {
        (r["vec_id"], r["c0"], r["c1"], r["c2"], r["c3"])
        for r in similarity.pq_encode(
            emb, "embedding", "vec_id", n_subspaces=4, with_error=False
        ).collect()
    }
    got = {
        (r["id"], r["c0"], r["c1"], r["c2"], r["c3"])
        for r in codes.collect()
    }
    assert got == want


def test_ivfpq_rerank_over_all_candidates_equals_ivf_probe(spark, tmp_path):
    """Exactness backstop: reranking the ENTIRE probed candidate set with
    raw vectors must reproduce the uncompressed IVF probe bit-for-bit —
    same routing (shared _routing_gemm), same candidates, same scorer
    (shared gemm_topk_pairs), same tie-breaks. This pins that IVF-PQ's
    approximation lives ONLY in the ADC scoring/truncation, never in the
    routing or candidate generation."""
    emb = _embeddings(spark)
    pq_path = str(tmp_path / "ivfpq")
    ivf_path = str(tmp_path / "ivf")
    ann_index.write_ivfpq_index(emb, "embedding", "vec_id", pq_path, n_cells=16)
    ann_index.write_ivf_index(emb, "embedding", "vec_id", ivf_path, n_cells=16)

    queries = emb.where(F.col("vec_id") < 30)
    n = emb.count()
    got = {
        tuple(r)
        for r in ann_index.probe_ivfpq_index(
            spark, pq_path, queries, "embedding", "vec_id",
            k=5, n_probe=4, rerank_src=emb, rerank_r=n,
        ).collect()
    }
    want = {
        tuple(r)
        for r in ann_index.probe_ivf_index(
            spark, ivf_path, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    assert got == want and len(got) == 30 * 5


def test_ivfpq_rerank_improves_adc_recall(spark, tmp_path):
    """The exact-cosine rerank of the ADC top-4k must recall strictly more
    of the uncompressed IVF top-k than raw ADC ranking does. (The synthetic
    embeddings are near-random — median pairwise cosine 0.000 — so absolute
    PQ recall is inherently modest; measured at sf0.01: ADC ≈ 0.25,
    rerank ≈ 0.55. The floors assert half that margin to stay robust.)"""
    emb = _embeddings(spark)
    pq_path = str(tmp_path / "ivfpq")
    ivf_path = str(tmp_path / "ivf")
    ann_index.write_ivfpq_index(emb, "embedding", "vec_id", pq_path, n_cells=16)
    ann_index.write_ivf_index(emb, "embedding", "vec_id", ivf_path, n_cells=16)

    queries = emb.where(F.col("vec_id") < 40)
    exact = ann_index.probe_ivf_index(
        spark, ivf_path, queries, "embedding", "vec_id", k=10, n_probe=6
    )
    adc = ann_index.probe_ivfpq_index(
        spark, pq_path, queries, "embedding", "vec_id", k=10, n_probe=6
    )
    rer = ann_index.probe_ivfpq_index(
        spark, pq_path, queries, "embedding", "vec_id",
        k=10, n_probe=6, rerank_src=emb,
    )
    r_adc = _recall(adc, exact, "query_id", "vec_id", "vec_id", "nbr")
    r_rer = _recall(rer, exact, "query_id", "vec_id", "vec_id", "nbr")
    assert r_rer > r_adc
    assert r_adc >= 0.12 and r_rer >= 0.4


def test_ivfpq_probe_prunes_partitions(spark, tmp_path):
    """The code scan must carry the probed-cell IN-list as a plan-time
    PartitionFilter — same serving-path property as the raw IVF index."""
    emb = _embeddings(spark)
    path = str(tmp_path / "ivfpq")
    ann_index.write_ivfpq_index(emb, "embedding", "vec_id", path, n_cells=16)

    one_query = emb.where(F.col("vec_id") == 7)
    out = ann_index.probe_ivfpq_index(
        spark, path, one_query, "embedding", "vec_id", k=3, n_probe=2
    )
    assert out.count() == 3

    import numpy as np

    cent_rows = (
        spark.read.parquet(path + "/_centroids").orderBy("cell").collect()
    )
    cent = np.stack([np.asarray(r["vec"]) for r in cent_rows]).astype(np.float64)
    qv = np.asarray(one_query.collect()[0]["embedding"], dtype=np.float64)
    qc = (cent @ qv) / (np.linalg.norm(cent, axis=1) * np.linalg.norm(qv))
    np.round(qc, 6, out=qc)
    probe_cells = [int(c) for c in np.argsort(-qc, kind="stable")[:2]]
    pruned = spark.read.parquet(path).where(F.col("cell").isin(probe_cells))
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cell" in pf_line and " IN " in pf_line
    assert all(str(c) in pf_line for c in probe_cells)


def test_double_precision_vectors_round_trip(spark, tmp_path):
    """The centroid sidecar must preserve the source element type: with
    array<double> vectors a float32 sidecar would route append/probe
    against truncated centroids, breaking parity with the in-memory path."""
    from pyspark.sql.types import ArrayType, DoubleType

    emb = _embeddings(spark).select(
        "vec_id", F.col("embedding").cast(ArrayType(DoubleType())).alias("embedding")
    )
    path = str(tmp_path / "ivf_double")
    ann_index.write_ivf_index(emb, "embedding", "vec_id", path, n_cells=16)
    cents = spark.read.parquet(path + "/_centroids")
    assert isinstance(cents.schema["vec"].dataType.elementType, DoubleType)

    queries = emb.where(F.col("vec_id") < 30)
    got = {
        tuple(r)
        for r in ann_index.probe_ivf_index(
            spark, path, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in similarity.ivf_ann_topk(
            emb, "embedding", "vec_id", k=5, n_cells=16, n_probe=4
        )
        .where(F.col("vec_id") < 30)
        .collect()
    }
    assert got == want and len(got) == 30 * 5


def test_ivfpq_append_equals_rebuild(spark, tmp_path):
    """IVF-PQ incremental append: building on the first 400 vectors then
    appending the last 100 equals a full rebuild — the frozen quantizer
    AND the frozen codebook (both read from sidecars) make routing and
    codes identical either way, so probes agree bit-for-bit."""
    emb = _embeddings(spark)
    base = emb.where(F.col("vec_id") < 400)
    extra = emb.where(F.col("vec_id") >= 400)

    p_inc = str(tmp_path / "ivfpq_inc")
    ann_index.write_ivfpq_index(base, "embedding", "vec_id", p_inc, n_cells=16)
    ann_index.append_to_ivfpq_index(extra, "embedding", "vec_id", p_inc)

    p_full = str(tmp_path / "ivfpq_full")
    ann_index.write_ivfpq_index(emb, "embedding", "vec_id", p_full, n_cells=16)

    queries = emb.where(F.col("vec_id") % 50 == 0)
    got = {
        tuple(r)
        for r in ann_index.probe_ivfpq_index(
            spark, p_inc, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in ann_index.probe_ivfpq_index(
            spark, p_full, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    assert got == want and len(got) == queries.count() * 5


def test_ivfpq_multi_increment_append_equals_rebuild(spark, tmp_path):
    """Production ingest never appends exactly once (r12 VERDICT #7):
    build on the first third, append the middle third, then append the
    final third — the frozen-quantizer/frozen-codebook contract must
    hold under REPEATED growth, so the twice-grown index probes
    bit-identically to a from-scratch build over the full corpus."""
    emb = _embeddings(spark)
    p_inc = str(tmp_path / "ivfpq_inc3")
    ann_index.write_ivfpq_index(
        emb.where(F.col("vec_id") < 167), "embedding", "vec_id", p_inc, n_cells=16
    )
    ann_index.append_to_ivfpq_index(
        emb.where((F.col("vec_id") >= 167) & (F.col("vec_id") < 334)),
        "embedding",
        "vec_id",
        p_inc,
    )
    ann_index.append_to_ivfpq_index(
        emb.where(F.col("vec_id") >= 334), "embedding", "vec_id", p_inc
    )

    p_full = str(tmp_path / "ivfpq_full3")
    ann_index.write_ivfpq_index(emb, "embedding", "vec_id", p_full, n_cells=16)

    queries = emb.where(F.col("vec_id") % 50 == 0)
    got = {
        tuple(r)
        for r in ann_index.probe_ivfpq_index(
            spark, p_inc, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in ann_index.probe_ivfpq_index(
            spark, p_full, queries, "embedding", "vec_id", k=5, n_probe=4
        ).collect()
    }
    assert got == want and len(got) == queries.count() * 5


def test_ivfpq_ensure_index_marker_crash_consistency(spark, tmp_path, monkeypatch):
    """ivfpq_ensure_index's cache contract: a directory WITHOUT the _BUILT
    marker (crashed build) is rebuilt, and a completed build is reused
    (no second write). The marker is written only after write_ivfpq_index
    fully returns, so a half-written index can never be probed."""
    import os

    from udlang_spark.queries import llm as llm_q
    from tests.conftest import SF_DIR_CORRECTNESS

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    path = llm_q.ivfpq_ensure_index(spark, SF_DIR_CORRECTNESS)
    marker = os.path.join(path, "_BUILT")
    assert os.path.exists(marker)
    first_mtime = os.path.getmtime(marker)

    # completed build: second call must reuse, not rebuild
    assert llm_q.ivfpq_ensure_index(spark, SF_DIR_CORRECTNESS) == path
    assert os.path.getmtime(marker) == first_mtime

    # crashed build: directory present, marker missing -> full rebuild
    os.remove(marker)
    assert llm_q.ivfpq_ensure_index(spark, SF_DIR_CORRECTNESS) == path
    assert os.path.exists(marker)


def test_ivfpq_gc_retires_stale_generations(tmp_path):
    """A cache-miss build garbage-collects sibling index dirs of the SAME
    (sf_dir, variant) identity with a stale fingerprint — and ONLY those:
    other variants, other sf_dirs, and markerless dirs survive (ADVICE
    r7: stranded /tmp/udlang_spark_ivfpq_* generations)."""
    import os
    import shutil
    import tempfile

    from udlang_spark.queries.llm import _ivfpq_gc_stale

    td = tempfile.gettempdir()

    def mk(tag, key):
        p = f"{td}/udlang_spark_ivfpq_gctest{tag}"
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "_BUILT"), "w") as fh:
            fh.write(key)
        return p

    cur_key = "/d/sf|fpA|cells=16|m=4|cb=(1,2)|fmt=3"
    cur = mk("cur", cur_key)
    stale = mk("stale", "/d/sf|fpOLD|cells=16|m=4|cb=(1,2)|fmt=3")
    othervar = mk("var", "/d/sf|append|fpA|cells=16|m=4|cb=(1,2)|fmt=3")
    otherdir = mk("dir", "/e/sf|fpA|cells=16|m=4|cb=(1,2)|fmt=3")
    bare = f"{td}/udlang_spark_ivfpq_gctestbare"
    os.makedirs(bare, exist_ok=True)
    try:
        _ivfpq_gc_stale(cur_key, cur)
        assert os.path.exists(cur)
        assert not os.path.exists(stale)
        assert os.path.exists(othervar)
        assert os.path.exists(otherdir)
        assert os.path.exists(bare)
    finally:
        for p in (cur, stale, othervar, otherdir, bare):
            shutil.rmtree(p, ignore_errors=True)
