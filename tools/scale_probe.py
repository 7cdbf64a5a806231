"""Scale probe: replicate the sf0.1 blocks table N× (ids shifted, vectors
jittered per-replica via a deterministic column expression) and time the
top-k strategies as N grows. This is the local stand-in for a cluster
scale-up: it shows which plans scale linearly with data per core (two-phase
local top-k) vs which degrade (window-only exact rank over the full cross
product).

Usage: python tools/scale_probe.py [factors...]   (default: 1 5 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.rbac import derive
from vectorsearch_rbac_spark.operators import knn

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_blocks(spark, sf_dir: str, factor: int):
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    n = emb.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n).alias("block_id"),
            ((F.col("vec_id") + F.col("rep") * n) % F.lit(docs.count())).alias("document_id"),
            # jitter dim 0 per replica so replicas aren't exact ties
            F.concat(
                F.array((F.element_at("embedding", 1) + F.col("rep") * 1e-4).cast("float")),
                F.slice("embedding", 2, 9999),
            ).alias("vector"),
        )
        .repartition(32, "block_id")
    )
    return big


def main(factors):
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = derive.derive_queries(emb, 100)
    qroles = derive.query_roles(queries)
    spark.range(1).count()
    print(f"{'factor':>6} {'rows':>9} {'fast2phase':>11} {'windowed':>9} {'prefilter':>10}")
    for f in factors:
        big = replicated_blocks(spark, SF_DIR, f).localCheckpoint()
        rows = big.count()
        perm = derive.derive_rbac(
            load_table(spark, "customer", SF_DIR),
            load_table(spark, "documents", SF_DIR),
            emb,
        )["permission_assignment"]

        t0 = time.time()
        knn.knn_topk_fast(big, queries, k=10).count()
        t_fast = time.time() - t0

        t0 = time.time()
        scored = big.join(
            F.broadcast(queries.select("query_id", "query_vector")), how="cross"
        ).select(
            "query_id", "block_id", "document_id",
            F.round(__import__("vectorsearch_rbac_spark.functions.vector", fromlist=["l2_distance"]).l2_distance("vector", "query_vector"), 6).alias("distance"),
        )
        knn.topk_per_query(scored, 10).count()
        t_win = time.time() - t0

        t0 = time.time()
        knn.knn_prefilter(big, queries, qroles, perm, k=10).count()
        t_pre = time.time() - t0

        print(f"{f:>6} {rows:>9} {t_fast:>10.2f}s {t_win:>8.2f}s {t_pre:>9.2f}s")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 5, 20])
