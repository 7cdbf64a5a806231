"""Hot-partition skew probe: plant a heavy access set (one comb_role owning
~40% of a 20×-replicated corpus), co-locate tasks by partition key, and time
the dynamic-store search with and without heavy-partition rebalance
(reference parity: ``heavy_partition_refine.py`` exists precisely because
one hot partition becomes the straggler task at scale).

The search itself is provably identical either way (routing matches on
comb_role); what rebalance changes is the PHYSICAL task layout — the hot
partition's rows spread over ⌈n/max⌉ centroid sub-buckets, so no single
task carries 40% of the scan.

Usage: python tools/skew_probe.py [factor]   (default 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.rbac import derive
from vectorsearch_rbac_spark.operators import dynamic

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(factor: int = 20) -> None:
    spark = get_spark("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "embeddings", SF_DIR)
    docs = load_table(spark, "documents", SF_DIR)
    n, nd = emb.count(), docs.count()

    reps = spark.range(factor).select(F.col("id").alias("rep"))
    blocks = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n).alias("block_id"),
            ((F.col("vec_id") + F.col("rep") * n) % nd).alias("document_id"),
            F.col("embedding").alias("vector"),
        )
    )
    d = F.col("document_id")
    docs_ids = docs.select(F.col("doc_id").alias("document_id"))
    # ~40% of docs collapse into access set {1,4} → one hot comb_role
    pa = (
        docs_ids.where(d % 3 == 0).select("document_id", F.lit(1).cast("int").alias("role_id"))
        .unionAll(docs_ids.where(d % 3 == 0).select("document_id", F.lit(4).cast("int").alias("role_id")))
        .unionAll(docs_ids.where(d % 3 != 0).select("document_id", (d % 10).cast("int").alias("role_id")))
        .unionAll(docs_ids.where(d % 3 != 0).select("document_id", ((d + 3) % 10).cast("int").alias("role_id")))
        .distinct()
    )
    queries = derive.derive_queries(emb, 100)
    qroles = derive.query_roles(queries)
    spark.range(1).count()

    store = dynamic.build_store(blocks, pa)
    rows = store.count()
    cpus = spark.sparkContext.defaultParallelism

    hot = dynamic.partition_sizes(store).orderBy(F.desc("n_blocks")).first()
    print(f"rows={rows}  hottest comb_role '{hot['comb_role']}' holds "
          f"{hot['n_blocks']} ({100 * hot['n_blocks'] / rows:.0f}%)")

    # co-locate by partition key (the on-disk layout a partitioned store has)
    skewed = store.repartition(cpus, "comb_role").localCheckpoint()
    rebal = dynamic.rebalance_heavy_partitions(store, max_partition_size=max(rows // cpus, 50))
    rebal = rebal.repartition(cpus, "part_key").localCheckpoint()

    for label, st in (("skewed", skewed), ("rebalanced", rebal)):
        mx = st.groupBy(F.spark_partition_id().alias("p")).count().agg(F.max("count")).first()[0]
        best = None
        for _ in range(3):
            t0 = time.time()
            dynamic.knn_dynamic(st, queries, qroles, k=10).count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        print(f"{label:>11}: max task rows {mx:>8}  search {best:.2f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
