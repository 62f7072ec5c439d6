"""bigdata_processing_spark — a PySpark-native analytics engine.

A clean-room, DataFrame/Spark-SQL-first engine covering (and generalizing)
the query surface of the reference project ``milanhub007/BigData-Processing``
(six RDD-level Ethereum-analytics Spark drivers; see SURVEY.md for the full
structural analysis with file:line citations into /root/reference).

Design principles
-----------------
- DataFrame, not RDD: every operator is declared via the DataFrame/SQL API so
  Catalyst handles predicate pushdown, column pruning, join strategy and AQE.
- Declared schemas everywhere (StructType); no schema-less text parsing in
  the hot path (the reference re-validated every CSV line inside Python
  lambdas — see SURVEY.md §2.2).
- JVM-side expressions first; Arrow-batched pandas UDFs only where built-ins
  genuinely cannot express the semantics (vector math fallback, multimodal
  decode plumbing).
- Scale-aware: broadcast hints for dimension tables, AQE skew handling,
  map-side partial aggregation, no driver-side collect loops.
"""

__version__ = "0.1.0"

from bigdata_processing_spark.session import get_spark  # noqa: F401
from bigdata_processing_spark.catalog import load_tables, register_views  # noqa: F401
