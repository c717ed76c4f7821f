"""udlang_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of uDLang (reference: emdash/udlang), extended
with the relational and LLM-data-pipeline operators a 100 TB training-data
pipeline needs.

Architecture (SURVEY.md §7): a thin compiler from the uDLang kernel language
onto pure ``pyspark.sql.Column`` expressions (frontend inlines all functions;
multi-``out`` kernels lower to array + posexplode), plus a Pythonic operator
library that is stock Spark underneath — Catalyst/Tungsten do the optimizing.
"""

from udlang_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
