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
# History: r3 relational q01–q50 (50/50). r4 kernel + oracled-LLM (47
# green + 3 harness errs, re-confirmed r5). r5 the 38 never-checked +
# mid-round additions (50/50). r6 4 never-checked + 13 r6 operators + 33
# oldest re-confirmations — 49/50, 1 red (k_tower, fixed r7: BIGINT cast
# both engines; strict checker now hashes driver-faithful pandas dtypes).
# r7 (50/50 green): k_tower + 5 never-checked + q34–q50 (r3-stale) + the
# 17 round-7 operators at land time + 10 oldest r4 kernel greens.
# Round-9 window (cumulative state after r8: all 197 registered queries
# green at their latest driver check — 50 at r8, 49 each at r7/r6/r5;
# staleness debt = the 49 r5 greens, then the 49 r6 greens):
#   (a) ALL 49 r5-stale greens (VERDICT r8 next-round #1 — the entire
#       streaming block, the embedding family, q53–q66, the tokenizer/
#       retrieval rows, the media rows). Among them, e_semdedup, e_kmeans
#       and q53_sketch_stats CHANGED this round (kmeans_assign: cached
#       assignment + fused per-iteration update; semantic_dedup: enforced
#       cluster-size cap + GEMM compare — VERDICT r8 #1a/b; q53: distinct
#       count split out of the mixed agg to kill the Expand — 23 s → 2.4 s),
#       so their rows re-earn on the new plans;
#   (b) d_neardup_index — NEW this round (VERDICT r8 #4: the persisted
#       near-dup ingest index), registered at land time, strict-verified
#       the day it landed, sharing d_incremental_neardup's oracle.
# 49 + 1 = 50. After r9 drains, no query's latest driver green is older
# than r6. ALSO new this round: d_span_scrub_maximal (VERDICT r8 #6) —
# oracled + strict-checker-green at land time, but the window is full;
# it is FIRST IN LINE for the r10 window, followed by the 49 r6-stale
# greens (q01–q33 relational block, e_pq/ivfpq family, s_* sketch
# streams, k_generic, q67/q68, t_cms/hll/quantile/weighted rows).
_PRIORITY: list[str] = [
    # -- (a) the 49 r5-stale re-confirmations --
    "d_dedup_keeper",
    "d_duplicate_spans",
    "d_split_leakage",
    "e_ann_lsh",
    "e_int8_quantize",
    "e_ivf_ann",
    "e_kmeans",
    "e_label_centroids",
    "e_mmr_rerank",
    "e_near_dups_lsh",
    "e_random_proj",
    "e_semdedup",
    "k_attempt",
    "k_comprehension",
    "m_features",
    "m_frames",
    "m_real_decode",
    "m_video_frames",
    "q53_sketch_stats",
    "q54_pattern_match",
    "q55_user_ema",
    "q56_nation_trade_volume",
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
    "s_windowed_stream",
    "t_bigram_lm",
    "t_bm25_topk",
    "t_bpe_encode",
    "t_bpe_learn",
    "t_dedup_words",
    "t_domain_mix",
    "t_gopher_rules",
    "t_hybrid_rrf",
    "t_pii_scrub",
    "t_wordpiece",
    # -- (b) round-9 operator, registered at land time --
    "d_neardup_index",
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
