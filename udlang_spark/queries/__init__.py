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
# Round-3 window: relational q01–q50 (50/50 green). Round-4: kernel +
# oracled-LLM (47 green + 3 harness errs, re-confirmed r5). Round-5: the 38
# never-checked + mid-round additions, 50/50 green. Round-6: 4 remaining
# never-checked + 13 round-6 operators + 33 oldest re-confirmations
# (q01–q33) — 49/50 green, 1 red (k_tower DECIMAL(20,0) dtype divergence,
# fixed this round: BIGINT cast both engines, tools/strict_oracle_check.py
# now hashes the driver's pandas-fetched values and fails risky dtypes).
# Round-7 window: (a) k_tower (the red row, re-checked first) + the 5
# operators that landed after the r6 window filled and have never had a
# driver row (q69_udtf, m_audio_features, e_pca_cov, t_classifier_score,
# t_retrieval_eval); (b) q34–q50, the stalest greens (last confirmed r3);
# (c) the 16 round-7 operators, each swapped in AT LAND TIME for the
# youngest tail re-confirmation (register-at-land-time discipline,
# VERDICT r6 #7) — every one strict-verified the day it landed, full
# sweeps re-run after each batch (artifacts/STRICT_SWEEP_r07{b,d,e,f}.txt,
# finally 185/185); (d) 11 of the oldest r4 greens (the kernel family)
# in the remaining slots. Round-8 re-confirmation debt, stalest first:
# the ~32 remaining r4 greens (k_match_union, k_cast, k_builtins,
# k_modules, k_methods, k_pipeline, k_spread, the d_* dedup family,
# t_token_stats..q52), then the r5 s_* streaming block.
_PRIORITY: list[str] = [
    # -- (a) red-row fix + never driver-checked (6) --
    "k_tower",
    "q69_udtf",
    "m_audio_features",
    "e_pca_cov",
    "t_classifier_score",
    "t_retrieval_eval",
    # -- (b) stalest re-confirmations: last green round 3 (17) --
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
    # -- (c) round-7 operators land here (swap out the list tail) --
    "k_point",
    "q70_bucketed_join",
    "q71_zorder_layout",
    "t_kmv_jaccard",
    "t_group_quantiles",
    "m_ahash_dedup",
    "s_kmv_stream",
    "q72_interval_union",
    "e_negative_pairs",
    "q73_copurchase_pairs",
    "e_ivfpq_append",
    "k_loop",
    "k_simple",
    "t_dataset_card",
    "q74_skew_probe",
    "d_split_temporal",
    "e_norm_audit",
    # -- (d) oldest r4 greens --
    "k_hello",
    "k_function",
    "k_fact",
    "k_count",
    "k_count_interp",
    "k_lists",
    "k_scopes",
    "k_subjunctive",
    "k_filter",
    "k_mapiter",
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
