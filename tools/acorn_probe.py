"""ACORN selectivity sweep (D5): predicate-aware traversal must hold
recall as the predicate gets MORE selective — the regime where plain
graph search + postfilter collapses (too few passing results near the
entry) and prefilter scans too much. Sweeps the number of roles per
query (1 role ≈ 19% of docs pass, 5 roles ≈ 70%) and reports recall vs
the exact permitted answer for (a) ACORN-1 2-hop traversal, (b) a
naive filtered beam (same beam, NO 2-hop expansion ≈ post-filtering the
graph's neighborhood) as the ablation, and (c) ACORN-γ (γ=4, ef=96) —
the dense-graph variant that replaces detours with neighbor-list
truncation; per-query wall is reported for (a) vs (c) so the γ
speed-for-recall trade is visible next to the recall columns.

Usage: python tools/acorn_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from vectorsearch_rbac_spark.operators import graph_ann, knn
from vectorsearch_rbac_spark.sources import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("acorn_probe")
    spark.sparkContext.setLogLevel("ERROR")
    t = entry._rbac(spark, SF_DIR)
    blocks, queries = t["documentblocks"], t["queries"]

    for n_roles in (1, 2, 5):
        qr = (
            queries.select("query_id")
            .join(spark.range(n_roles).select(F.col("id").alias("k")), how="cross")
            .select("query_id", F.pmod(F.col("query_id") + F.col("k") * 3, F.lit(10)).alias("role_id"))
        )
        import time

        truth = knn.knn_prefilter(blocks, queries, qr, t["permission_assignment"], k=10)
        t0 = time.time()
        pred = graph_ann.acorn_search(blocks, queries, qr, k=10, m=8, ef=48)
        r = knn.recall_at_k(pred, truth).agg(F.round(F.avg("recall"), 3)).first()[0]
        t1 = time.time() - t0
        naive = graph_ann.acorn_search(blocks, queries, qr, k=10, m=8, ef=48, expand_2hop=False)
        rn = knn.recall_at_k(naive, truth).agg(F.round(F.avg("recall"), 3)).first()[0]
        t0 = time.time()
        gam = graph_ann.acorn_search(blocks, queries, qr, k=10, m=8, ef=96, gamma=4)
        rg = knn.recall_at_k(gam, truth).agg(F.round(F.avg("recall"), 3)).first()[0]
        tg = time.time() - t0
        # selectivity: fraction of docs permitted under this role set
        perm = (
            qr.join(t["permission_assignment"], "role_id")
            .select("query_id", "document_id").distinct()
            .groupBy("query_id").count().agg(F.avg("count")).first()[0]
        )
        nd = t["permission_assignment"].select("document_id").distinct().count()
        print(f"roles/query={n_roles} selectivity={perm / nd:.2f} "
              f"acorn_recall@10={r} ({t1:.1f}s) no2hop_recall@10={rn} "
              f"gamma_recall@10={rg} ({tg:.1f}s)")


if __name__ == "__main__":
    main()
