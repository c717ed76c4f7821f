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
# Round-10 window (cumulative state after r9: all 199 registered queries
# green at their latest driver check — 50 at r9, 50 at r8, 49 each at
# r7/r6 — EXCEPT d_span_scrub_maximal, strict-green at land time (r9) but
# never driver-checked because the r9 window was full):
#   (a) d_span_scrub_maximal FIRST — the only registered query with no
#       driver row (VERDICT r9 next-round #1);
#   (b) ALL 49 r6-stale greens (VERDICT r9 next-round #1: the q01–q33
#       relational block, the PQ/IVF-PQ/hamming family, the sketch
#       streams s_cms/s_hll/s_quantile/s_enrich, k_generic, q67/q68,
#       t_cms/hll/quantile/weighted). Computed programmatically as
#       {q : latest CORRECTNESS round == 6} — exactly 49.
# 1 + 49 = 50. After r10 drains, every query's latest driver green is r7
# or newer and zero queries lack a driver row — EXCEPT t_shard_plan (NEW
# round 10: deterministic epoch-shuffle resharding), registered at land
# time, strict-checker-green the day it landed, but the window was
# already full; it is FIRST IN LINE for the r11 window, followed by the
# changed-this-round implementations (d_span_scrub r8-green,
# d_incremental_neardup r8-green — both strict-re-verified post-change)
# and the 50 r7-stale greens.
_PRIORITY: list[str] = [
    # -- (a) the round-9 operator awaiting its first driver row --
    "d_span_scrub_maximal",
    # -- (b) the 49 r6-stale re-confirmations --
    "e_hamming_topk",
    "e_ivfpq_ann",
    "e_pq_adc",
    "e_pq_encode",
    "k_generic",
    "q01_pricing_summary",
    "q02_forecast_revenue",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_region_volume",
    "q06_customers_without_orders",
    "q07_custdist",
    "q08_topk_per_group",
    "q09_running_totals",
    "q10_set_ops",
    "q11_distinct_counts",
    "q12_rollup",
    "q13_events_tumbling",
    "q14_events_json",
    "q15_orders_monthly",
    "q16_part_strings",
    "q17_supplier_by_region",
    "q18_asof_join",
    "q19_cube",
    "q20_median_udaf",
    "q21_range_join",
    "q22_salted_agg",
    "q23_percentiles",
    "q24_lag_lead",
    "q25_disjunctive_pricing",
    "q26_small_qty_revenue",
    "q27_grouping_sets",
    "q28_pivot",
    "q29_window_frames",
    "q30_hash_sample",
    "q31_gap_fill",
    "q32_sessionize",
    "q33_unpivot",
    "q67_bloom_prune",
    "q68_hierarchy",
    "s_cms_merge",
    "s_cms_stream",
    "s_enrich_stream",
    "s_hll_stream",
    "s_quantile_stream",
    "t_cms_freq",
    "t_hll_distinct",
    "t_quantile_sketch",
    "t_weighted_sample",
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
