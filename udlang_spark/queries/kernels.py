"""uDLang kernel queries: reference example programs compiled by the kernel
compiler (udlang_spark.kernel) and applied to testdata tables.

Registry filled in as the kernel compiler lands.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
