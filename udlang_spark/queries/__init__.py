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
# Round-3 window: relational q01–q50 (50/50 green). Round-4 window: kernel +
# oracled-LLM + s_cdc_apply + q51/q52 (47 green + 3 array-output harness errs,
# adjudicated value-correct and since serialized to sortable strings). This
# round the window covers every oracled query that had NEVER had a driver row
# entering round 5 (38 entries: q54–q65, the round-4 late additions, the
# re-serialized array-output queries, and the round-5 oracle conversions —
# iterative/streaming/sketch/multimodal/ANN), the five corpus-cleaning
# queries added mid-round (driver-checked immediately), and 7
# re-confirmations. EVERY registered query carries an oracle; none are
# rows-only. The mid-round additions t_hybrid_rrf and s_neardup_stream
# took the window slots of two twice-confirmed re-confirmations
# (q41_min_cost_supplier, d_minhash_lsh — both green in r3): a first
# driver row is worth more than a third confirmation.
_PRIORITY: list[str] = [
    # -- never driver-checked (38) --
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
    "k_attempt",
    "m_real_decode",
    "t_bm25_topk",
    "d_split_leakage",
    "t_domain_mix",
    "k_comprehension",
    "e_label_centroids",
    "e_int8_quantize",
    "e_kmeans",
    "e_semdedup",
    "s_kernel_stream",
    "s_windowed_stream",
    "s_stateful_totals",
    "s_stream_join",
    "s_dedup_stream",
    "s_session_stream",
    "e_pagerank",
    "q53_sketch_stats",
    "m_frames",
    "m_video_frames",
    "m_features",
    "e_near_dups_lsh",
    "e_ann_lsh",
    "e_ivf_ann",
    "t_pii_scrub",
    "q66_salted_join",
    # -- round-5 additions (corpus cleaning), driver-checked immediately --
    "t_gopher_rules",
    "t_dedup_words",
    "d_duplicate_spans",
    "t_bigram_lm",
    "t_wordpiece",
    # -- late round-5 additions, driver-checked immediately --
    "t_hybrid_rrf",
    "s_neardup_stream",
    "t_bpe_learn",
    "d_dedup_keeper",
    "t_bpe_encode",
    "e_random_proj",
    "e_mmr_rerank",
    # (re-confirmation slots exhausted: t_corpus_pipeline / e_cosine_topk /
    # s_cdc_apply rotated out for the three newest operators — all three
    # already have green driver rows on record from r3/r4, and a first
    # driver row is worth more than a repeat confirmation. e_pq_encode,
    # e_pq_adc, and t_cms_freq, added after the window filled, are
    # strict-green at both SFs + property pytests and wait for the next
    # rotation.)
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
