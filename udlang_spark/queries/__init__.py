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

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (relational, llm, kernels, streaming):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

__all__ = ["QUERIES", "ORACLE", "QueryFn"]
