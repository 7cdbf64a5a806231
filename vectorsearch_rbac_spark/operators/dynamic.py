"""Dynamic combination-role partitioned vector store.

Parity: reference ``controller/dynamic_partition/`` — blocks live in
partitions keyed by the *document's access set* (``comb_role`` = sorted list
of roles that may reach the document); ``hnsw/insertion.py`` and
``deletion.py`` maintain the per-partition indexes as blocks arrive/leave;
``search.py:17`` answers a query by scanning only the partitions whose
comb_role intersects the user's roles.

Spark-native form: the store is a comb_role-keyed DataFrame (on disk:
``partitionBy(comb_role)`` parquet — see ``partitioning.write_partitioned``).
Maintenance is incremental set algebra (union new / anti-join deleted) —
exactly the lakehouse pattern (Delta/Iceberg MERGE); no per-partition graph
index to rebuild, because partition pruning + vectorized scan is the
cluster-scale substitute for HNSW (SURVEY.md §3).

Scale notes: the store is the 100 TB fact side and is only unioned /
anti-joined / scanned; routing tables (comb_role → member roles, query →
comb_role) are dim-sized and broadcast. A search scans only the partitions
whose comb_role contains one of the user's roles — membership of a doc in
such a partition *is* the permission proof, so no per-block permission
re-check is needed (the same invariant the reference's partition design
guarantees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import _METRICS, topk_per_query


def _doc_comb(permission_assignment: DataFrame) -> DataFrame:
    """document_id → canonical comb_role key (sorted role list)."""
    return permission_assignment.groupBy("document_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.col("role_id").cast("string"))), ","
        ).alias("comb_role")
    )


def build_store(blocks: DataFrame, permission_assignment: DataFrame) -> DataFrame:
    """Initial store build: every block keyed by its document's comb_role.

    Parity: ``dynamic_partition/initialize_dynamic_partitions.py`` — one
    partition per distinct document access-set, each block stored exactly
    once (vs per-role replication).
    """
    return blocks.join(F.broadcast(_doc_comb(permission_assignment)), "document_id")


def insert_blocks(store: DataFrame, new_blocks: DataFrame, permission_assignment: DataFrame) -> DataFrame:
    """Route new blocks to their comb_role partition and append.

    Parity: ``dynamic_partition/hnsw/insertion.py`` — the reference inserts
    into the partition's HNSW graph; here the append is a union the writer
    folds into the partitioned layout (new files in existing partition dirs —
    no index rebuild, no shuffle of the existing store).
    """
    routed = new_blocks.join(F.broadcast(_doc_comb(permission_assignment)), "document_id")
    return store.unionByName(routed)


def delete_blocks(store: DataFrame, deleted_ids: DataFrame, id_col: str = "block_id") -> DataFrame:
    """Remove blocks by id (anti-join).

    Parity: ``dynamic_partition/hnsw/deletion.py``; the lakehouse execution
    is a MERGE DELETE touching only partitions that contain the ids.
    """
    return store.join(F.broadcast(deleted_ids), id_col, "left_anti")


def comb_role_members(store: DataFrame) -> DataFrame:
    """comb_role → member role_id (exploded routing dimension, broadcast)."""
    return (
        store.select("comb_role").distinct()
        .select(
            "comb_role",
            F.explode(F.transform(F.split("comb_role", ","), lambda c: c.cast("int"))).alias("role_id"),
        )
    )


def knn_dynamic(
    store: DataFrame,
    queries: DataFrame,
    query_roles: DataFrame,
    k: int = 10,
    metric: str = "l2",
) -> DataFrame:
    """Search the dynamic store: scan only partitions whose comb_role
    contains one of the query's roles, exact top-k merge.

    Parity: ``dynamic_partition/search.py:17`` (partition lookup by role
    intersection, per-partition search, merge). Exact: a doc is in a scanned
    partition iff its access set intersects the user's roles — precisely the
    RBAC predicate — so recall is 1.0 with no per-block re-check.
    """
    dist = _METRICS[metric]
    qpart = (
        F.broadcast(query_roles)
        .join(comb_role_members(store), "role_id")
        .select("query_id", "comb_role")
        .distinct()
    )
    scored = (
        store.join(F.broadcast(qpart), "comb_role")  # partition pruning
        .join(F.broadcast(queries.select("query_id", "query_vector")), "query_id")
        .select(
            "query_id", "block_id", "document_id",
            F.round(dist("vector", "query_vector"), 6).alias("distance"),
        )
    )
    return topk_per_query(scored, k).select("query_id", "block_id", "document_id", "distance", "rank")
