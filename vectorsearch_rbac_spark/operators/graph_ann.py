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
