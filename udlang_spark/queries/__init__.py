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
# Round-11 window (cumulative state after r10: all 200 then-registered
# queries green at their latest driver check — staleness histogram r7:49,
# r8:50, r9:50, r10:50 — with t_shard_plan the sole query lacking a
# driver row, strict-green at land time but landed after the r10 window
# filled):
#   (a) the two queries with NO driver row: t_shard_plan (r10 VERDICT #1:
#       "first in line") and s_shard_stream (NEW round 11 — its streaming
#       twin, r10 VERDICT #6; shares ORACLE_SHARD_PLAN verbatim);
#   (b) the five implementations changed in round 10 AFTER their last
#       driver row (r10 VERDICT #1: all strict-re-verified post-change,
#       none driver-checked on the new code): d_span_scrub,
#       d_span_scrub_maximal, d_neardup_index, d_incremental_neardup,
#       e_semdedup — d_neardup_index changed AGAIN in r11 (persisted
#       candidate relation + Spark-side dpfx) and d_span_scrub[_maximal]
#       ride the r11 shingles let1 change, so their rows verify the
#       latest code;
#   (c) 43 of the 49 r7-stale greens (computed programmatically as
#       {q : latest CORRECTNESS round == 7}), k_tower first — its sized-
#       int compilation changed in r11 (range-check operand hoisting +
#       subsumed-recheck elimination, the janino fix). The 6 deferred to
#       r12 are the trivially-pinned kernels whose compile paths are
#       covered by in-window siblings and pytest (k_hello, k_simple,
#       k_point, k_scopes, k_count — k_count_interp stays in — and
#       k_lists); r12 should lead with them plus the r8-stale block
#       (which includes every shingles-consumer re-shaped by r11's let1:
#       d_minhash_lsh, d_dedup_corpus, d_simhash_neardup, d_exact_dedup,
#       d_incremental_dedup, t_decontam, d_line_dedup — all strict-green
#       on the new code this round).
# 2 + 5 + 43 = 50.
_PRIORITY: list[str] = [
    # -- (a) no driver row yet --
    "t_shard_plan",
    "s_shard_stream",
    # -- (b) changed after their last driver row --
    "d_span_scrub",
    "d_span_scrub_maximal",
    "d_neardup_index",
    "d_incremental_neardup",
    "e_semdedup",
    # -- (c) r7-stale re-confirmations (43 of 49; k_tower changed r11) --
    "k_tower",
    "k_count_interp",
    "k_fact",
    "k_filter",
    "k_function",
    "k_loop",
    "k_mapiter",
    "k_subjunctive",
    "d_split_temporal",
    "e_ivfpq_append",
    "e_norm_audit",
    "e_pca_cov",
    "m_ahash_dedup",
    "m_audio_features",
    "q34_upsert",
    "q35_scd2",
    "q36_sql_passthrough",
    "q37_data_audit",
    "q38_histogram",
    "q39_variant_json",
    "q40_sole_latest_shipper",
    "q41_min_cost_supplier",
    "q42_important_parts",
    "q43_market_share",
    "q44_fuzzy_part_pairs",
    "q45_zscore_outliers",
    "q46_stratified_sample",
    "q47_shipmode_priority",
    "q48_supplier_variety",
    "q49_inactive_rich_customers",
    "q50_funnel",
    "q69_udtf",
    "q70_bucketed_join",
    "q71_zorder_layout",
    "q72_interval_union",
    "q73_copurchase_pairs",
    "q74_skew_probe",
    "s_kmv_stream",
    "t_classifier_score",
    "t_dataset_card",
    "t_group_quantiles",
    "t_kmv_jaccard",
    "t_retrieval_eval",
]
# Round-11 late additions (registered AFTER the window above filled, same
# pattern as t_shard_plan in r10): e_ann_recall (in-plan IVF recall@5 vs
# brute-force eval over a fixed 500-query panel), t_maxsim_topk
# (ColBERT-style late-interaction MaxSim top-k), and s_maxsim_stream
# (its stateless-ingest streaming twin, sharing ORACLE_T_MAXSIM
# verbatim) — all strict-green at sf0.001/0.01/0.1 at land time, with
# independent pytest replicas for the batch pair. r12's window should
# lead with these three, then the 6 deferred kernels (k_hello, k_simple,
# k_point, k_scopes, k_count, k_lists) and the r8-stale block (see note
# above).
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
