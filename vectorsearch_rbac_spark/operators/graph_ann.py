"""Graph-based ANN search (SURVEY §2 D2): partition-local navigable-
small-world graphs with beam search — the Spark-native re-expression of
the reference's per-partition hnswlib indexes
(``controller/dynamic_partition/hnsw/insertion.py`` attaches an HNSW to
every comb-role partition; ``search.py:17`` searches the partitions a
query's roles reach).

Design for a cluster:

- The graph is PARTITION-LOCAL, never global: each partition (comb-role,
  IVF list, or the whole corpus at toy scale) builds its own kNN graph
  and answers queries independently inside ONE ``applyInPandas`` stage —
  the same shape that lets the reference drop an hnswlib index per
  partition. No cross-partition edges ⇒ no graph shuffle, and a
  partition rebuild touches only its own rows (exactly the reference's
  insert/delete maintenance unit).
- Build: exact kNN adjacency per partition via blocked BLAS (argpartition
  over a dot-product block), symmetrized (undirected edges double the
  out-degree and fix the connectivity that pure kNN graphs lack).
- Search: classic best-first beam (HNSW layer-0 semantics): entry point =
  the partition medoid (deterministic), expand the closest frontier node,
  keep an ``ef``-sized result beam, stop when the frontier can't improve
  it. Per query-batch work is O(visited·m) distance evaluations —
  independent of partition size once the beam converges, which is the
  whole point of graph ANN vs scan-based IVF.
- Results merge with the repo's standard two-phase top-k (per-partition
  candidates → global rank), so RBAC routing composes: restrict the
  partition set per query exactly as ``knn_budget``/``knn_dynamic`` do.

Approximate op ⇒ recall-checked (``ann_recall`` 'graph' member + pytest
floor), no SQL oracle — same basis as IVF/PQ/LSH.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _knn_adjacency(vecs: np.ndarray, m: int) -> list[list[int]]:
    """Exact kNN graph of one partition, symmetrized. O(n²) dots via one
    BLAS matmul per block — partition-local by design, so n is the
    partition size, not the corpus."""
    n = vecs.shape[0]
    m = min(m, n - 1)
    if m <= 0:
        return [[] for _ in range(n)]
    norms = (vecs * vecs).sum(axis=1)
    adj: list[set[int]] = [set() for _ in range(n)]
    block = max(256, min(4096, n))
    for s in range(0, n, block):
        e = min(s + block, n)
        d2 = norms[s:e, None] + norms[None, :] - 2.0 * (vecs[s:e] @ vecs.T)
        for i in range(e - s):
            d2[i, s + i] = np.inf
        nb = np.argpartition(d2, m, axis=1)[:, :m]
        for i in range(e - s):
            for v in nb[i]:
                adj[s + i].add(int(v))
                adj[int(v)].add(s + i)
    return [sorted(a) for a in adj]


def _beam_search(vecs, adj, entry, q, k, ef):
    dist = lambda u: float(np.sum((vecs[u] - q) ** 2))
    d0 = dist(entry)
    visited = {entry}
    frontier = [(d0, entry)]          # min-heap
    beam = [(-d0, entry)]             # max-heap, size ≤ ef
    while frontier:
        d, u = heapq.heappop(frontier)
        if len(beam) >= ef and d > -beam[0][0]:
            break
        for v in adj[u]:
            if v in visited:
                continue
            visited.add(v)
            dv = dist(v)
            if len(beam) < ef or dv < -beam[0][0]:
                heapq.heappush(frontier, (dv, v))
                heapq.heappush(beam, (-dv, v))
                if len(beam) > ef:
                    heapq.heappop(beam)
    out = sorted(((-nd, u) for nd, u in beam))
    return out[:k]


def nsw_search(
    blocks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ef: int = 48,
    id_col: str = "block_id",
    vec_col: str = "vector",
    part_col: str | None = None,
) -> DataFrame:
    """Beam-search every query against every partition's NSW graph; merge
    with a global rank window (two-phase top-k). ``part_col=None`` treats
    the corpus as one partition (toy scale); with a partition column each
    group builds/searches its own graph in parallel.

    The Q-sized query table is collected and closure-captured (same class
    as the centroid collects in ivf/pq — dim-sized, broadcast by Spark
    with the task closure); the corpus-sized ``blocks`` relation only
    flows through the grouped Arrow stage.
    """
    spark = blocks.sparkSession
    q_rows = queries.select("query_id", "query_vector").collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.asarray([r["query_vector"] for r in q_rows], dtype=np.float64)

    src = blocks.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        (F.col(part_col) if part_col else F.lit(0)).alias("_part"),
    )
    schema = "query_id long, _id long, distance double"

    def search_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        vecs = np.stack(pdf["_vec"].values).astype(np.float64)
        ids = pdf["_id"].to_numpy()
        adj = _knn_adjacency(vecs, m)
        entry = int(np.argmin(((vecs - vecs.mean(axis=0)) ** 2).sum(axis=1)))
        rows = []
        for qi, qv in zip(q_ids, q_mat):
            for d2, u in _beam_search(vecs, adj, entry, qv, k, ef):
                rows.append((qi, int(ids[u]), float(np.sqrt(max(d2, 0.0)))))
        return pd.DataFrame(rows, columns=["query_id", "_id", "distance"])

    cand = src.groupBy("_part").applyInPandas(search_group, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.round("distance", 6).asc(), F.col("_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("_id").alias(id_col),
                F.round("distance", 6).alias("distance"), "rank")
    )


# ---------------------------------------------------------- index lifecycle
# Parity: dynamic_partition/hnsw/insertion.py / deletion.py — the reference
# mutates a per-partition hnswlib index in place; here the adjacency is a
# DataFrame (part, id, neighbors) and every mutation is a partition-local
# relational transform, so the maintenance unit (one partition) matches and
# the index itself survives as ordinary columnar storage.


def build_nsw_graph(
    blocks: DataFrame,
    m: int = 8,
    id_col: str = "block_id",
    vec_col: str = "vector",
    part_col: str | None = None,
) -> DataFrame:
    """Materialize the per-partition symmetrized kNN adjacency as a
    DataFrame ``(part, id, neighbors array<bigint>)`` — the persisted
    index; build cost is one blocked-BLAS pass per partition."""
    src = blocks.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        (F.col(part_col) if part_col else F.lit(0)).alias("part"),
    )

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        vecs = np.stack(pdf["_vec"].values).astype(np.float64)
        ids = pdf["_id"].to_numpy()
        adj = _knn_adjacency(vecs, m)
        part = pdf["part"].iloc[0]
        return pd.DataFrame(
            {
                "part": part,
                "id": ids,
                "neighbors": [[int(ids[v]) for v in a] for a in adj],
            }
        )

    return src.groupBy("part").applyInPandas(
        build_group, schema="part long, id long, neighbors array<long>"
    )


def nsw_search_indexed(
    blocks: DataFrame,
    adjacency: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef: int = 48,
    id_col: str = "block_id",
    vec_col: str = "vector",
    part_col: str | None = None,
) -> DataFrame:
    """Search a PREBUILT adjacency (no rebuild per query batch): vectors
    join their neighbor lists on the id key inside each partition, and the
    beam runs exactly as in :func:`nsw_search`."""
    src = blocks.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_vec"),
        (F.col(part_col) if part_col else F.lit(0)).alias("part"),
    ).join(adjacency, ["part", "id"])

    q_rows = queries.select("query_id", "query_vector").collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.asarray([r["query_vector"] for r in q_rows], dtype=np.float64)

    def search_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        vecs = np.stack(pdf["_vec"].values).astype(np.float64)
        ids = pdf["id"].to_numpy()
        pos = {int(i): p for p, i in enumerate(ids)}
        adj = [
            [pos[int(v)] for v in nbrs if int(v) in pos]
            for nbrs in pdf["neighbors"].values
        ]
        entry = int(np.argmin(((vecs - vecs.mean(axis=0)) ** 2).sum(axis=1)))
        rows = []
        for qi, qv in zip(q_ids, q_mat):
            for d2, u in _beam_search(vecs, adj, entry, qv, k, ef):
                rows.append((qi, int(ids[u]), float(np.sqrt(max(d2, 0.0)))))
        return pd.DataFrame(rows, columns=["query_id", "id", "distance"])

    cand = src.groupBy("part").applyInPandas(
        search_group, schema="query_id long, id long, distance double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("distance", 6).asc(), F.col("id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col),
                F.round("distance", 6).alias("distance"), "rank")
    )


def insert_into_graph(
    blocks: DataFrame,
    adjacency: DataFrame,
    new_blocks: DataFrame,
    m: int = 8,
    id_col: str = "block_id",
    vec_col: str = "vector",
    part_col: str | None = None,
) -> DataFrame:
    """Incremental insert (insertion.py parity): each new node links to its
    ``m`` nearest EXISTING nodes in its partition (exact within the
    partition — the hnswlib beam is an approximation of exactly this), and
    reverse edges are appended to those neighbors. One applyInPandas pass
    per partition touching only partitions that receive rows; untouched
    partitions' adjacency flows through unchanged."""
    src_old = blocks.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"),
        (F.col(part_col) if part_col else F.lit(0)).alias("part"),
        F.lit(False).alias("_new"),
    )
    src_new = new_blocks.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"),
        (F.col(part_col) if part_col else F.lit(0)).alias("part"),
        F.lit(True).alias("_new"),
    )
    touched = src_new.select("part").distinct()
    src = src_old.join(F.broadcast(touched), "part", "left_semi").unionByName(src_new).join(
        adjacency.select("part", "id", "neighbors"), ["part", "id"], "left"
    )

    def insert_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        part = int(pdf["part"].iloc[0])
        is_new = pdf["_new"].to_numpy()
        ids = pdf["id"].to_numpy()
        nbrs: dict[int, set[int]] = {}
        for i in np.flatnonzero(~is_new):
            lst = pdf["neighbors"].iloc[i]
            nbrs[int(ids[i])] = set(int(x) for x in (lst if lst is not None else []))
        old_idx = np.flatnonzero(~is_new)
        new_idx = np.flatnonzero(is_new)
        if len(old_idx) and len(new_idx):
            ov = np.stack(pdf["_vec"].iloc[old_idx].values).astype(np.float64)
            oid = ids[old_idx]
            on = (ov * ov).sum(axis=1)
            for i in new_idx:
                v = np.asarray(pdf["_vec"].iloc[i], dtype=np.float64)
                d2 = on - 2.0 * (ov @ v)
                mm = min(m, len(old_idx))
                picks = (
                    np.argpartition(d2, mm - 1)[:mm] if mm < len(old_idx)
                    else np.arange(len(old_idx))
                )
                mine = set(int(oid[p]) for p in picks)
                nbrs[int(ids[i])] = mine
                for t in mine:
                    nbrs[t].add(int(ids[i]))
        else:
            for i in new_idx:
                nbrs.setdefault(int(ids[i]), set())
        ordered = sorted(nbrs)
        return pd.DataFrame(
            {"part": part, "id": ordered, "neighbors": [sorted(nbrs[i]) for i in ordered]}
        )

    updated = src.groupBy("part").applyInPandas(
        insert_group, schema="part long, id long, neighbors array<long>"
    )
    untouched = adjacency.join(F.broadcast(touched), "part", "left_anti")
    return untouched.unionByName(updated)


def delete_from_graph(adjacency: DataFrame, delete_ids: DataFrame) -> DataFrame:
    """Delete (deletion.py parity): drop the nodes and filter them out of
    every neighbor list — a narrow map plus one broadcast anti-join; heavy
    deletions degrade connectivity, and the repair unit is a partition
    rebuild (build_nsw_graph on that partition), exactly the reference's
    heavy-partition-refine escalation."""
    gone = F.broadcast(delete_ids.select(F.col(delete_ids.columns[0]).alias("_gone")))
    gone_arr = delete_ids.select(
        F.collect_set(F.col(delete_ids.columns[0]).cast("long")).alias("g")
    )
    return (
        adjacency.join(gone, adjacency["id"] == F.col("_gone"), "left_anti")
        .crossJoin(F.broadcast(gone_arr))
        .select(
            "part", "id",
            F.filter("neighbors", lambda v: ~F.array_contains(F.col("g"), v)).alias("neighbors"),
        )
    )


def knn_dynamic_graph(
    store: DataFrame,
    queries: DataFrame,
    query_roles: DataFrame,
    k: int = 10,
    m: int = 8,
    ef: int = 48,
) -> DataFrame:
    """The reference's HEADLINE architecture end-to-end: dynamic comb-role
    partitions, a graph index per partition, role-routed search
    (``dynamic_partition/search.py:17`` + per-partition hnswlib): each
    query beam-searches ONLY the partitions its roles reach, and the
    per-partition candidates merge through the global rank.

    Spark shape: the (query → comb_role) routing is the same broadcast
    role-intersection join ``knn_dynamic`` uses; the per-partition search
    is a COGROUPED applyInPandas — partition blocks on one side, that
    partition's routed queries on the other — so a partition's graph is
    built/searched once regardless of how many queries route to it, work
    scales with Σ(partition × its queries), and partitions with no routed
    queries are never touched. RBAC stays exact by construction (a block
    is in a routed partition iff its access set intersects the query's
    roles); only the top-k is approximate (beam), so the check is recall
    against the exact ``knn_dynamic`` answer.
    """
    from .dynamic import comb_role_members

    # rename through the members table so the cogroup's two sides don't
    # share the store's comb_role attribute (self-join ambiguity)
    members = comb_role_members(store).withColumnRenamed("comb_role", "_cr")
    qpart = (
        F.broadcast(query_roles)
        .join(members, "role_id")
        .select("query_id", F.col("_cr").alias("comb_role"))
        .distinct()
    )
    routed_q = qpart.join(
        F.broadcast(queries.select("query_id", "query_vector")), "query_id"
    )

    def search_cogroup(blocks_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(blocks_pdf) == 0 or len(q_pdf) == 0:
            return pd.DataFrame(columns=["query_id", "block_id", "document_id", "distance"])
        blocks_pdf = blocks_pdf.sort_values("block_id").reset_index(drop=True)
        vecs = np.stack(blocks_pdf["vector"].values).astype(np.float64)
        ids = blocks_pdf["block_id"].to_numpy()
        docs = blocks_pdf["document_id"].to_numpy()
        adj = _knn_adjacency(vecs, m)
        entry = int(np.argmin(((vecs - vecs.mean(axis=0)) ** 2).sum(axis=1)))
        rows = []
        for r in range(len(q_pdf)):
            qi = int(q_pdf["query_id"].iloc[r])
            qv = np.asarray(q_pdf["query_vector"].iloc[r], dtype=np.float64)
            for d2, u in _beam_search(vecs, adj, entry, qv, k, ef):
                rows.append((qi, int(ids[u]), int(docs[u]), float(np.sqrt(max(d2, 0.0)))))
        return pd.DataFrame(rows, columns=["query_id", "block_id", "document_id", "distance"])

    cand = (
        store.select("comb_role", "block_id", "document_id", "vector")
        .groupBy("comb_role")
        .cogroup(routed_q.groupBy("comb_role"))
        .applyInPandas(
            search_cogroup,
            schema="query_id long, block_id long, document_id long, distance double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("distance", 6).asc(), F.col("block_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "block_id", "document_id",
                F.round("distance", 6).alias("distance"), "rank")
    )


# ------------------------------------------------------------------ ACORN
def _acorn_beam(vecs, adj, q, k, ef, allowed, expand_2hop=True):
    """Predicate-aware best-first beam (ACORN-1, Patel et al. 2024,
    arXiv:2403.04871 — the algorithm behind the reference's
    acorn_benchmark/): the beam and frontier hold only PASSING nodes, but
    expansion routes through failing neighbors to their neighbors (2-hop),
    preserving the connectivity the filtered subgraph loses when the
    predicate knocks out bridge nodes."""
    idx = np.where(allowed)[0]
    if idx.size == 0:
        return []
    mean = vecs[idx].mean(axis=0)
    entry = int(idx[np.argmin(((vecs[idx] - mean) ** 2).sum(axis=1))])
    dist = lambda u: float(np.sum((vecs[u] - q) ** 2))
    d0 = dist(entry)
    visited = {entry}
    frontier = [(d0, entry)]
    beam = [(-d0, entry)]
    while frontier:
        d, u = heapq.heappop(frontier)
        if len(beam) >= ef and d > -beam[0][0]:
            break
        cand = []
        for v in adj[u]:
            if allowed[v]:
                cand.append(v)
            elif expand_2hop:
                # 2-hop expansion THROUGH the failing node
                cand.extend(w for w in adj[v] if allowed[w])
        for v in cand:
            if v in visited:
                continue
            visited.add(v)
            dv = dist(v)
            if len(beam) < ef or dv < -beam[0][0]:
                heapq.heappush(frontier, (dv, v))
                heapq.heappush(beam, (-dv, v))
                if len(beam) > ef:
                    heapq.heappop(beam)
    return sorted(((-nd, u) for nd, u in beam))[:k]


def acorn_search(
    blocks: DataFrame,
    queries: DataFrame,
    query_roles: DataFrame,
    k: int = 10,
    m: int = 8,
    ef: int = 48,
    id_col: str = "block_id",
    vec_col: str = "vector",
    part_col: str | None = None,
    expand_2hop: bool = True,
) -> DataFrame:
    """D5 completed as REAL predicate-aware graph traversal: one graph
    over the (un-partitioned) corpus, the RBAC predicate evaluated per
    node DURING the beam search (ACORN-1 2-hop expansion) — the
    mid-selectivity regime where prefilter scans too much and a
    role-aligned partition layout doesn't exist. Complements the
    cost-model router in plans/strategy.py: that picks BETWEEN
    prefilter/postfilter; this searches WITH the filter in the graph.

    The arithmetic RBAC predicate (SURVEY §4: doc % 10 ∈ roles or
    (doc+3) % 10 ∈ roles) is evaluated vectorized per partition from each
    query's (small, closure-captured) role set — no per-query allowed-id
    lists ship anywhere. Approximate op ⇒ recall-checked like the other
    graph members.
    """
    q_rows = queries.select("query_id", "query_vector").collect()
    roles_map: dict[int, set[int]] = {}
    for r in query_roles.select("query_id", "role_id").collect():
        roles_map.setdefault(r["query_id"], set()).add(int(r["role_id"]))
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.asarray([r["query_vector"] for r in q_rows], dtype=np.float64)

    src = blocks.select(
        F.col(id_col).alias("_id"),
        F.col("document_id").alias("_doc"),
        F.col(vec_col).alias("_vec"),
        (F.col(part_col) if part_col else F.lit(0)).alias("_part"),
    )
    schema = "query_id long, _id long, distance double"

    def search_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        vecs = np.stack(pdf["_vec"].values).astype(np.float64)
        ids = pdf["_id"].to_numpy()
        docs = pdf["_doc"].to_numpy()
        adj = _knn_adjacency(vecs, m)
        rows = []
        for qi, qv in zip(q_ids, q_mat):
            roles = roles_map.get(qi, set())
            allowed = np.isin(docs % 10, list(roles)) | np.isin((docs + 3) % 10, list(roles))
            for d2, u in _acorn_beam(vecs, adj, qv, k, ef, allowed, expand_2hop):
                rows.append((qi, int(ids[u]), float(np.sqrt(max(d2, 0.0)))))
        return pd.DataFrame(rows, columns=["query_id", "_id", "distance"])

    cand = src.groupBy("_part").applyInPandas(search_group, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.round("distance", 6).asc(), F.col("_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("_id").alias(id_col),
                F.round("distance", 6).alias("distance"), "rank")
    )
