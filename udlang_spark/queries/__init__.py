"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named query (Callable[(SparkSession, sf_dir)] -> DataFrame) plus, where
SQL-expressible, a DuckDB oracle SQL string producing identical columns.

Cross-engine determinism rules used throughout:
- money aggregates go through DECIMAL so sums are exact in both engines, then
  cast to double (correctly-rounded, deterministic) — no float-sum-order
  nondeterminism can leak into the hash;
- every top-k has a total-order tie-break;
- timestamps in outputs are formatted to strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udlang_spark.queries import cleaning, kernels, llm, relational, streaming

QueryFn = Callable[[SparkSession, str], DataFrame]

_ALL_QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (kernels, llm, streaming, relational, cleaning):
    _ALL_QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

# Registration order matters: the external driver differentially verifies the
# FIRST 50 registry entries against their DuckDB oracles each round.
# History: r3 relational q01-q50 (50/50). r4 kernel + oracled-LLM. r5 the
# 38 never-checked + mid-round additions (50/50). r6 49/50 (k_tower red,
# fixed r7). r7 50/50. r8-r12: 50/50 each; after r12 ALL 207 registered
# queries are green at their latest check and none is staler than r8
# (histogram r8:10, r9:48, r10:49, r11:50, r12:50).
# Round-13 window (per r12 VERDICT #1: drain the r8-stale block first,
# then the oldest r9 block; new queries register IN-window at land time):
#   (a) the NEW round-13 query, registered at land time:
#       t_retrieval_pipeline (the end-to-end hybrid retrieval serving
#       pipeline — BM25 arm + persisted-IVF-PQ ADC arm + RRF fusion +
#       chunk-level MaxSim rerank in ONE plan, r12 VERDICT #4);
#   (b) the 10 r8-stale rows, 4 rounds without a driver re-check:
#       d_url_dedup, k_pipeline, m_ahash_neardup, m_image_meta,
#       m_payload_meta, q51_transitions, t_heavy_hitters, t_langid,
#       t_lift_bigrams, t_span_corrupt;
#   (c) 39 of the 48 r9-stale rows. The 9 deferred to r14, each with
#       sibling coverage on current code: t_bm25_topk and t_hybrid_rrf
#       (their scorer/fusion run VERBATIM inside in-window
#       t_retrieval_pipeline - _bm25_scored is shared code and the
#       oracle embeds _bm25_oracle(); both also ride the bench headline
#       every round), m_frames (sibling m_video_frames in-window, shared
#       frame-slice path), e_ann_lsh (sibling e_near_dups_lsh in-window,
#       same in-bucket GEMM), e_label_centroids (siblings
#       e_centroid_assign r12-green + e_kmeans in-window),
#       k_comprehension (kernel family: 13 kernel rows green r11/r12;
#       comprehension path fuzz-pinned), q56_nation_trade_volume (plain
#       agg-join TPC-H shape; q57/q60/q61/q62 in-window),
#       s_windowed_stream (sibling s_session_stream in-window; tumbling
#       agg also driver-green via q13 r10), d_duplicate_spans (span
#       machinery re-rowed r11 via d_span_scrub/_maximal; t_span_corrupt
#       in-window).
# 1 + 10 + 39 = 50.
_PRIORITY: list[str] = [
    # -- (a) new round-13 query at land time --
    "t_retrieval_pipeline",
    # -- (b) the r8-stale block --
    "d_url_dedup",
    "k_pipeline",
    "m_ahash_neardup",
    "m_image_meta",
    "m_payload_meta",
    "q51_transitions",
    "t_heavy_hitters",
    "t_langid",
    "t_lift_bigrams",
    "t_span_corrupt",
    # -- (c) the r9-stale block (39 of 48) --
    "d_dedup_keeper",
    "d_split_leakage",
    "e_int8_quantize",
    "e_ivf_ann",
    "e_kmeans",
    "e_mmr_rerank",
    "e_near_dups_lsh",
    "e_random_proj",
    "k_attempt",
    "m_features",
    "m_real_decode",
    "m_video_frames",
    "q53_sketch_stats",
    "q54_pattern_match",
    "q55_user_ema",
    "q57_product_profit",
    "q58_returned_items",
    "q59_promo_effect",
    "q60_top_supplier",
    "q61_large_volume_customers",
    "q62_dominant_suppliers",
    "q63_running_distinct",
    "q64_global_seq",
    "q65_snapshot_diff",
    "q66_salted_join",
    "s_dedup_stream",
    "s_kernel_stream",
    "s_neardup_stream",
    "s_session_stream",
    "s_stateful_totals",
    "s_stream_join",
    "t_bigram_lm",
    "t_bpe_encode",
    "t_bpe_learn",
    "t_dedup_words",
    "t_domain_mix",
    "t_gopher_rules",
    "t_pii_scrub",
    "t_wordpiece",
]
assert len(_PRIORITY) == 50, len(_PRIORITY)
assert len(set(_PRIORITY)) == 50
assert all(n in _ALL_QUERIES and n in ORACLE for n in _PRIORITY), [
    n for n in _PRIORITY if n not in _ALL_QUERIES or n not in ORACLE
]

QUERIES: dict[str, QueryFn] = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update(
    (name, fn) for name, fn in _ALL_QUERIES.items() if name not in QUERIES
)

__all__ = ["QUERIES", "ORACLE", "QueryFn"]
