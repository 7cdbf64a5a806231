"""Measure what the D10 budget optimizer buys: the fraction of the corpus a
query's TOUCHED PARTITIONS hold (= files a scan must open on a partitioned
lakehouse layout), naive single-partition vs optimized, under a skewed
workload (one hot access set owns ~40% of blocks and most queries hit it).

Row-level scan cost is identical by construction (the atom-level scan plan
reads exactly the permitted blocks either way); partition-touch fraction is
the physical-pruning metric the optimizer improves — the reference's
storage-for-latency trade (AnonySys_dynamic_partition.py:425) expressed in
lakehouse terms.

Usage: python tools/layout_probe.py [sf_dir] [alpha]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.rbac import derive
from vectorsearch_rbac_spark.operators import layout


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    alpha = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    spark = get_spark("layout-probe")

    documents = load_table(spark, "documents", sf_dir)
    embeddings = load_table(spark, "embeddings", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    t = derive.derive_rbac(customer, documents, embeddings)
    blocks = t["documentblocks"]

    # skewed permissions: docs with doc_id % 3 == 0 collapse to the hot
    # access set {1, 4} (~40% of blocks); the rest keep the arithmetic spread
    d = F.col("document_id")
    docs = documents.select(F.col("doc_id").alias("document_id"))
    pa = (
        docs.where(d % 3 == 0).select("document_id", F.lit(1).cast("int").alias("role_id"))
        .unionAll(docs.where(d % 3 == 0).select("document_id", F.lit(4).cast("int").alias("role_id")))
        .unionAll(docs.where(d % 3 != 0).select("document_id", (d % 10).cast("int").alias("role_id")))
        .unionAll(docs.where(d % 3 != 0).select("document_id", ((d + 3) % 10).cast("int").alias("role_id")))
        .distinct()
    )
    # skewed workload: 70% of queries come from hot-comb users ({1,4} holders)
    queries = derive.derive_queries(embeddings, 25).withColumn(
        "user_id",
        F.when(F.col("query_id") % 10 < 7, F.lit(11))  # user 11 → roles {1, 4}? derive below
        .otherwise(F.col("user_id")),
    )
    # force user 11's roles to the hot comb via explicit query_roles
    qroles = (
        queries.where(F.col("user_id") == 11)
        .select("query_id", F.explode(F.array(F.lit(1), F.lit(4))).alias("role_id"))
        .unionByName(derive.query_roles(queries.where(F.col("user_id") != 11)))
    )
    user_roles = t["user_roles"].unionByName(
        spark.createDataFrame([(11, 1), (11, 4)], "user_id long, role_id int")
    ).distinct()

    opt = layout.optimize_layout(blocks, pa, queries, user_roles, alpha=alpha)
    rep = opt["report"]

    plan = layout.budget_scan_plan(qroles, opt["routing"], opt["assignment"])
    touched = plan.select("query_id", "partition_id").distinct()
    part_sizes = (
        opt["assignment"].groupBy("partition_id")
        .agg(F.first("partition_blocks").alias("p_blocks"))
    )
    total = rep["total_blocks"]
    per_q = (
        touched.join(part_sizes, "partition_id")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            (F.sum("p_blocks") / total).alias("touch_frac"),
        )
    )
    stats = per_q.agg(
        F.round(F.avg("touch_frac"), 4).alias("avg_touch_frac"),
        F.round(F.max("touch_frac"), 4).alias("max_touch_frac"),
        F.round(F.avg("n_partitions"), 2).alias("avg_partitions"),
    ).first()

    print(json.dumps({
        "sf_dir": sf_dir,
        "alpha": alpha,
        "n_partitions": rep["n_partitions"],
        "stored_over_total": round(rep["stored_blocks"] / total, 3),
        "naive_touch_frac": 1.0,  # single partition = every query opens everything
        "optimized_avg_touch_frac": stats["avg_touch_frac"],
        "optimized_max_touch_frac": stats["max_touch_frac"],
        "avg_partitions_touched": stats["avg_partitions"],
        "predicted_query_time_naive": rep["predicted_query_time_naive"],
        "predicted_query_time_optimized": rep["predicted_query_time"],
        "splits": rep["splits"],
    }, indent=1))


if __name__ == "__main__":
    main()
