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

from udlang_spark.queries import kernels, llm, relational, streaming

QueryFn = Callable[[SparkSession, str], DataFrame]

_ALL_QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (kernels, llm, streaming, relational):
    _ALL_QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

# Registration order matters: the external driver differentially verifies the
# FIRST 50 registry entries against their DuckDB oracles each round. Relational
# q01–q50 went green in round 3 (CORRECTNESS_r03: 50/50), so this round the
# window is rotated onto the categories that have never had a driver row:
# every kernel-language query (the reference's core surface), every oracled
# LLM-pipeline query, the one oracled streaming query, and the first two
# never-verified relational queries. Everything else still registers — the
# order only chooses what the 50-row window verifies.
_DEFERRED = {  # oracled but added after this round's window was cut;
    # rotate into the next round's window
    "m_real_decode",
    "k_attempt",
    "t_bm25_topk",
    "d_split_leakage",
    "t_domain_mix",
}
_PRIORITY: list[str] = [
    *[k for k in kernels.QUERIES if k not in _DEFERRED],  # 19, all oracled
    *[k for k in llm.QUERIES if k in llm.ORACLE and k not in _DEFERRED],  # 28
    "s_cdc_apply",                                       # streaming's oracled one
    "q51_transitions",
    "q52_retention",
]
assert len(_PRIORITY) == 50, len(_PRIORITY)

QUERIES: dict[str, QueryFn] = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update(
    (name, fn) for name, fn in _ALL_QUERIES.items() if name not in QUERIES
)

__all__ = ["QUERIES", "ORACLE", "QueryFn"]
