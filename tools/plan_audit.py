#!/usr/bin/env python
"""Registry-wide physical-plan audit: every registered query's plan is
scanned for the anti-patterns the per-query tests in tests/test_plans.py
assert individually — unbounded cartesian/nested-loop joins and
row-at-a-time Python evaluation. A WHITELIST carries the queries whose
docstrings *declare* the construct (the interp fallback, the UDTF surface,
Arrow-batched mapInPandas operators, deliberately-broadcast tiny-side
nested loops); anything not whitelisted is a regression, and a whitelist
entry that stops hitting its token is stale and flagged too, so the list
can only shrink honestly.

Usage: SPARK_GRAFT_CPUS=8 python tools/plan_audit.py [--sf DIR]
Exits nonzero on any unwhitelisted hit. Streaming queries drain first
(their plan tokens are audited on the drained batch result; the streaming
plans themselves are pinned by tests/test_streaming.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# token -> {query names allowed to carry it}; every entry cites why. The
# sets were seeded by running the audit open and verifying every hit
# against its operator docstring (r8); the STALE check keeps them honest.
WHITELIST: dict[str, set[str]] = {
    # row-at-a-time Python is the DOCUMENTED slow path in exactly one
    # place: the spark.udtf surface (per-row table function by
    # definition). The kernel interp fallback runs inside mapInPandas.
    "BatchEvalPython": {"q69_udtf"},
    "ArrowEvalPython": set(),
    # Arrow-batched pandas operators: vectorized by design. Three
    # families — numpy GEMM scorers over embedding batches/buckets/cells,
    # media decode loops, and distinct-word-domain tokenization — plus
    # the interp fallback. (r14: q64_global_seq's per-partition row-id
    # counter left this list — monotonically_increasing_id bit ops
    # replaced the Python pass.)
    "MapInPandas": {
        "k_count_interp",  # interp fallback (recursion beyond unroll)
        "t_wordpiece",  # distinct-word-domain segmentation
        "t_bpe_learn",  # BPE merge learning over the word domain
        "t_bpe_encode",  # BPE encode over the word domain
        "t_retrieval_eval",  # per-query metric eval (numpy batch)
        "m_real_decode",  # stdlib codec decode in the Arrow batch loop
        "m_frames",  # frame sampling over payload bytes
        "m_video_frames",  # container parse + frame slice
        "m_features",  # image feature extraction
        "m_audio_features",  # WAV decode + features
        "m_image_meta",  # header parse
        "m_ahash_dedup",  # pixel decode + aHash in Arrow batches
        "m_ahash_neardup",  # shares the fingerprint path
        "e_negative_pairs",  # batch-local partial top-k prune (r8)
        "e_centroid_assign",  # broadcast-centroid GEMM
        "e_cosine_topk",  # capped exact GEMM scorer
        "e_ann_recall",  # recall eval composes the capped GEMM + IVF probe
        "e_ivfpq_recall",  # exact arm GEMM (probe routing is driver-side numpy since r13)
        "e_ivfpq_append_recall",  # same arms vs the append-grown index
        "e_near_dups",  # capped exact GEMM scorer
        "e_near_dups_lsh",  # in-bucket GEMM scorer
        "e_ann_lsh",  # in-bucket GEMM top-k
        "e_ivf_ann",  # per-cell GEMM probe
        "e_kmeans",  # per-iteration assignment GEMM
        "e_semdedup",  # within-cluster GEMM
        "e_random_proj",  # plane-matrix GEMM per batch
        "e_mmr_rerank",  # per-query rerank
        "e_pq_encode",  # subspace quantization GEMM
        "e_pq_adc",  # ADC table scoring
        "e_pca_cov",  # covariance accumulation per batch
    },
    # grouped Arrow path (applyInPandas): per-bucket / per-cell /
    # per-query GEMM where the GROUP is the unit of vectorization.
    "FlatMapGroupsInPandas": {
        "e_semdedup",  # within-cluster compare GEMM (r9; operators/dedup.semantic_dedup)
        "e_near_dups_lsh",  # per-bucket threshold GEMM
        "e_ann_lsh",  # per-bucket top-k GEMM
        "e_ivf_ann",  # per-cell probe GEMM
        "e_ann_recall",  # IVF arm of the recall eval
        "e_ivfpq_recall",  # rerank arm per-query exact rescore (r12)
        "e_ivfpq_append_recall",  # same arms vs the append-grown index
        "e_mmr_rerank",  # per-query greedy rerank
        "t_retrieval_eval",  # per-query metric eval
    },
    # nested-loop joins: allowed only where one side is provably tiny and
    # the docstring declares it — 1-row scalar sidecars (corpus totals,
    # avgdl, quantile denominators: the r7-judge-audited "scalar-broadcast
    # cross" sites), |Q|-row query sets, or bounded distinct domains
    # (q44's 64x64 name domain).
    "BroadcastNestedLoop": {
        "e_negative_pairs",  # tiny query side vs corpus, declared
        "q44_fuzzy_part_pairs",  # 64x64 distinct name domain
        "t_tfidf_topk",  # 1-row n_docs sidecar
        "t_lift_bigrams",  # 1-row totals sidecar
        "t_rarity",  # 1-row totals sidecar
        "t_bm25_topk",  # 1-row avgdl sidecar
        "t_hybrid_rrf",  # 1-row totals sidecar
        "t_retrieval_pipeline",  # BM25 arm's 1-row stats sidecar (r13)
        "t_domain_mix",  # 1-row total + tot_w sidecars
        "t_quantile_sketch",  # 1-row N-from-buckets sidecar
        "t_kmv_jaccard",  # 1-row (k-1)*2^48 threshold sidecar
        "t_group_quantiles",  # per-group totals sidecar
        "t_dataset_card",  # 1-row corpus totals sidecar
        "e_mmr_rerank",  # |Q|-row query set cross
        "e_pq_adc",  # |Q|-row ADC table cross
        "e_hamming_topk",  # |Q|-row probe set cross
        "s_hll_stream",  # 1-row register-count sidecar (drained batch)
        "s_quantile_stream",  # 1-row N sidecar (drained batch)
        "q37_data_audit",  # 1-row corpus stats sidecar
        "q42_important_parts",  # 1-row threshold sidecar
        "q49_inactive_rich_customers",  # 1-row avg-balance sidecar
        "q50_funnel",  # 1-row stage-total sidecars
    },
    "CartesianProduct": set(),
}

TOKENS = tuple(WHITELIST)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from udlang_spark.queries import QUERIES
    from udlang_spark.session import get_spark, release_caches

    spark = get_spark("udlang_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    hits_by_token: dict[str, set[str]] = {t: set() for t in TOKENS}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # a query that cannot even plan is a FAIL
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        finally:
            release_caches()
        flags = []
        for tok in TOKENS:
            if tok in plan:
                hits_by_token[tok].add(name)
                if name not in WHITELIST[tok]:
                    flags.append(tok)
        if flags:
            print(f"FAIL {name}: unwhitelisted {flags}")
            bad += 1
        else:
            print(f"  ok {name}")
    # stale whitelist entries: declared but no longer hitting
    for tok, allowed in WHITELIST.items():
        stale = allowed - hits_by_token[tok]
        if stale:
            print(f"STALE whitelist[{tok}]: {sorted(stale)}")
            bad += 1
    print(f"\naudited={len(QUERIES)} failures={bad}")
    print("PLAN AUDIT GREEN" if bad == 0 else "PLAN AUDIT RED")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
