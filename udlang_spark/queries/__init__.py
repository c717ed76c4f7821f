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
# Round-8 window (cumulative state after r7: every one of the 186
# registered queries green at its latest driver check; staleness debt =
# 37 queries last confirmed r4, 50 last confirmed r5):
#   (a) ALL 37 remaining r4-stale greens — after r8 drains them, no
#       query's latest driver green is older than r5 (VERDICT r7 #1);
#   (b) the 11 round-8 operators, registered AT LAND TIME, each
#       strict-verified the day it landed (d_span_scrub, m_ahash_neardup,
#       t_lang_quality_bands, s_interval_stream, d_incremental_dedup,
#       d_url_dedup, d_line_dedup, t_dsir_select, s_url_dedup_stream,
#       t_length_outliers, d_incremental_neardup);
#   (c) e_negative_pairs and e_pagerank — green at r5/r7 but their
#       IMPLEMENTATIONS changed this round (negative_pairs: batch-local
#       partial top-k prune, VERDICT r7 #2; pagerank: in-plan dangling
#       mass, one action/iteration), so each re-earns a driver row on
#       its new plan;
# 37 + 11 + 2 = 50 — the r4 drain, the new operators, and the two
# changed implementations exactly fill the window. Round-9 debt, stalest
# first: all 49 r5 greens (the s_* streaming block, e_* embedding family,
# q53–q66, k_comprehension, k_attempt, d_dedup_keeper, t_pii_scrub,
# t_bm25_topk, t_hybrid_rrf, d_split_leakage, t_domain_mix), then the r6
# block.
_PRIORITY: list[str] = [
    # -- (a) the 37 r4-stale re-confirmations --
    "k_match_lit",
    "k_match_union",
    "k_cast",
    "k_builtins",
    "k_modules",
    "k_methods",
    "k_pipeline",
    "k_spread",
    "d_exact_dedup",
    "d_fingerprint",
    "d_minhash_lsh",
    "d_dedup_corpus",
    "d_ngram_jaccard",
    "d_simhash",
    "d_simhash_neardup",
    "t_token_stats",
    "t_quality",
    "t_langid",
    "t_ngram_topk",
    "t_repetition",
    "t_chunks",
    "t_pack_greedy",
    "t_tfidf_topk",
    "t_lift_bigrams",
    "t_rarity",
    "t_span_corrupt",
    "t_decontam",
    "t_corpus_pipeline",
    "t_heavy_hitters",
    "e_centroid_assign",
    "e_cosine_topk",
    "e_near_dups",
    "m_payload_meta",
    "m_image_meta",
    "s_cdc_apply",
    "q51_transitions",
    "q52_retention",
    # -- (b) round-8 operators, registered at land time --
    "d_span_scrub",
    "m_ahash_neardup",
    "t_lang_quality_bands",
    "s_interval_stream",
    "d_incremental_dedup",
    "d_url_dedup",
    "d_line_dedup",
    "t_dsir_select",
    "s_url_dedup_stream",
    "t_length_outliers",
    "d_incremental_neardup",
    # -- (c) changed implementations this round: re-earn the driver row --
    "e_negative_pairs",
    "e_pagerank",
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
