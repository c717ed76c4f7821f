"""LLM-data-pipeline queries (dedup, similarity, text analysis, multimodal).

Populated by udlang_spark.operators.{dedup,similarity,multimodal} and
udlang_spark.functions.text — registry filled in as operators land.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
