"""Plain-SQL surface: the whole engine from ``spark.sql(...)``.

A user of the reference talks SQL to Postgres; this module gives the same
entry point on Spark — :func:`register_views` publishes the star schema
AND the derived RBAC relations as temp views, and the core permission-
filtered vector search is provided as a pure SQL string (Spark SQL's
higher-order functions express the pgvector ``<->`` distance inline — no
UDF registration needed, the text compiles to the same Catalyst plan as
the DataFrame API).

Parity: the reference's query surface is literally this SQL
(``basic_benchmark/common_function.py:79`` builds the permission CTE +
ORDER BY vector <-> q LIMIT k); a reference user can paste an adapted
query here and run it distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .rbac import derive
from .sources import load_table

RBAC_VIEWS = (
    "users", "roles", "user_roles", "permission_assignment",
    "documentblocks", "queries", "query_roles",
)
TABLE_VIEWS = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# pgvector `<->` as inline Spark SQL (same arithmetic as functions.vector:
# double-cast elements, left-to-right fold, sqrt; 6-dp round + id
# tie-break = the repo determinism contract)
L2_SQL = (
    "sqrt(aggregate(zip_with({a}, {b}, (x, y) -> "
    "(double(x) - double(y)) * (double(x) - double(y))), 0D, (acc, v) -> acc + v))"
)

PREFILTER_TOPK_SQL = f"""
WITH permitted AS (
  SELECT DISTINCT qr.query_id, pa.document_id
  FROM query_roles qr JOIN permission_assignment pa ON qr.role_id = pa.role_id
),
scored AS (
  SELECT q.query_id, b.block_id, b.document_id,
         round({L2_SQL.format(a="b.vector", b="q.query_vector")}, 6) AS distance
  FROM permitted p
  JOIN documentblocks b ON p.document_id = b.document_id
  JOIN queries q ON q.query_id = p.query_id
)
SELECT query_id, block_id, document_id, distance, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY distance ASC, block_id ASC) AS rank
  FROM scored
) WHERE rank <= {{k}}
"""


def register_views(spark: SparkSession, sf_dir: str, query_stride: int = 100) -> list[str]:
    """Publish every table and derived RBAC relation as a temp view;
    returns the view names. Idempotent per session."""
    customer = load_table(spark, "customer", sf_dir)
    documents = load_table(spark, "documents", sf_dir)
    embeddings = load_table(spark, "embeddings", sf_dir)
    for t in TABLE_VIEWS:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    tabs = derive.derive_rbac(customer, documents, embeddings)
    tabs["queries"] = derive.derive_queries(embeddings, query_stride)
    tabs["query_roles"] = derive.query_roles(tabs["queries"])
    for name in RBAC_VIEWS:
        tabs[name].createOrReplaceTempView(name)
    return list(TABLE_VIEWS) + list(RBAC_VIEWS)


def sql_prefilter_topk(spark: SparkSession, k: int = 10) -> DataFrame:
    """The core query as pure SQL text (views must be registered)."""
    return spark.sql(PREFILTER_TOPK_SQL.format(k=k))
