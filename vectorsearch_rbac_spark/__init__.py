"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference RBAC vector-search system
(rjzhb/VectorSearch-RBAC), re-expressed Spark-first.

Subpackages:
- ``functions``: pgvector-parity vector column expressions + text analysis
  (pure ``pyspark.sql.functions`` compositions → whole-stage codegen).
- ``rbac``: RBAC data model derivation + generators
  (parity: reference ``services/rbac_generator``).
- ``operators``: RBAC-filtered KNN strategies, IVF index, LSH, dedup,
  multimodal plumbing (parity: reference ``controller/`` + ``basic_benchmark/``).
- ``plans``: relational analytics queries + adaptive strategy selection.
- ``sources``: table registry and partitioned writers.
- ``streaming``: structured-streaming ingest/dedup/sessionization.
"""

__version__ = "0.1.0"
