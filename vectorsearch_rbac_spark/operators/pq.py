"""Product quantization (SURVEY.md §2 D6): the memory-compression half of
IVF-PQ, the index family the reference's HNSW/IVF line points at for
beyond-RAM scale.

Parity rationale: the reference keeps full float vectors per partition
(dynamic_partition/hnsw); at 100 TB the scan cost is dominated by vector
bytes. PQ stores an m-byte code per vector (here m=8 codes over 64 dims =
32× compression vs float32) and answers queries with asymmetric distance
computation (ADC): one lookup-table build per query, then distance = sum of
m table lookups per candidate — no float vector is ever read at search time.

Spark mapping:
- codebook training: driver-side numpy on a bounded sample (same contract
  as ``ivf.kmeans_fit`` — pgvector ivfbuild.c-style sampling);
- encoding: one ``mapInPandas`` pass (argmin over ksub sub-centroids is a
  vectorized numpy reduction — the documented Pandas-UDF escape hatch);
- search: pure built-in expressions — the per-query LUT rides the plan as
  a literal-free computed column on the broadcast query side, and ADC is
  ``aggregate(zip_with(codes, luts, (c, l) -> l[c]))`` inside codegen, so
  the big side streams through whole-stage codegen reading only the code
  arrays.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    max_iter: int = 10,
    sample_per_code: int = 64,
    seed: int = 42,
) -> np.ndarray:
    """Train per-subspace codebooks: split dim into ``m`` equal subspaces,
    k-means (``ksub`` centroids) in each. Returns (m, ksub, dsub) float64.

    Driver-side on a bounded sample (ksub·sample_per_code rows), mirroring
    the IVF build contract — training data is small by design; encoding and
    search stay distributed.
    """
    target = ksub * sample_per_code
    n = embeddings.count()
    frac = min(1.0, (target * 1.2) / max(n, 1))
    sample = embeddings.select(vec_col).sample(frac, seed=seed).limit(target).collect()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    if len(X) < ksub:
        raise ValueError(f"sample ({len(X)}) smaller than ksub ({ksub})")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), ksub, replace=False)]
        for _ in range(max_iter):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            lab = d.argmin(1)
            newC = np.array([S[lab == k].mean(0) if (lab == k).any() else C[k] for k in range(ksub)])
            if np.allclose(newC, C):
                break
            C = newC
        books[j] = C
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): nearest sub-centroid per subspace, as array<int>.

    One Arrow-batched pass; the codebooks broadcast once per executor. The
    output is the 32×-smaller representation the search scans.
    """
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = bc.value
        m, ksub, dsub = B.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                d = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "codes": list(codes)})

    return embeddings.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, codes array<int>"
    )


def _query_luts(
    queries: DataFrame, codebooks: np.ndarray, qvec_col: str = "query_vector"
) -> DataFrame:
    """(query_id, _luts): per-query ADC tables, luts[j][k] = ||q_subj -
    codebook[j][k]||², built in one Arrow pass over the (tiny) query side.

    Deliberately NOT a literal expression tree: m·ksub·dsub terms blow past
    janino's method-size limits and fall out of codegen; a vectorized numpy
    pass on the dim-sized query table costs nothing and keeps the BIG side
    (the codes scan) pure built-in zip_with/aggregate codegen."""
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def lut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = bc.value
        m, ksub, dsub = B.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf[qvec_col].to_numpy()).astype(np.float64)
            out = []
            for qi in range(len(Q)):
                t = np.empty((m, ksub))
                for j in range(m):
                    t[j] = ((B[j] - Q[qi, j * dsub : (j + 1) * dsub]) ** 2).sum(-1)
                out.append(list(t))
            yield pd.DataFrame({"query_id": pdf["query_id"].to_numpy(), "_luts": out})

    return queries.select("query_id", qvec_col).mapInPandas(
        lut, schema="query_id long, _luts array<array<double>>"
    )


def pq_search(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: distance = Σ_j luts[j][code_j], evaluated as
    zip_with + aggregate inside codegen; rank window ships (id, distance)
    only. The scan never touches a float vector — only m small ints/row."""
    q = _query_luts(queries, codebooks)
    scored = codes.join(F.broadcast(q), how="cross").select(
        "query_id",
        F.col(id_col).alias("block_id"),
        F.round(
            F.aggregate(
                F.zip_with("codes", "_luts", lambda c, l: F.element_at(l, c + 1)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("distance"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("block_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("block_id").alias(id_col), "distance", "rank")
    )


def pq_search_refined(
    codes: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    expansion: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ + refine (the standard two-stage ANN): ADC shortlist of
    k·expansion candidates from the compressed codes, then EXACT L2 re-rank
    of the shortlist against the float vectors.

    This is the 100 TB read pattern: the full scan touches only m-byte
    codes; float vectors are fetched for k·expansion rows per query — a
    point-lookup-sized join, not a scan. Recall is governed by the
    expansion knob, exactness of the final ordering by the re-rank.
    """
    from ..functions import vector as V

    shortlist = pq_search(codes, queries, codebooks, k=k * expansion, id_col=id_col).select(
        "query_id", id_col
    )
    qv = queries.select("query_id", "query_vector")
    rescored = (
        shortlist.join(embeddings.select(id_col, vec_col), id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("block_id"),
            F.round(V.l2_distance(vec_col, "query_vector"), 6).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("block_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("block_id").alias(id_col), "distance", "rank")
    )
