"""Dedup scale probe: replicate the documents table N× (ids shifted, a
replica marker token appended so replicas aren't exact dupes) and time the
MinHash+LSH candidate pipeline as N grows. Linear growth = the pipeline is
scan-shaped (hash + wide agg + bounded bucket join); superlinear growth
would mean a hidden self-join or unbounded bucket blowup.

Usage: python tools/dedup_scale_probe.py [factors...]   (default: 1 5 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_docs(spark, sf_dir: str, factor: int):
    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" replicamark"), F.col("rep").cast("string")).alias("text"),
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("dedup-scale-probe")
    print(f"{'factor':>6} {'docs':>9} {'minhash_cand':>12} {'pairs':>8}")
    for f in factors:
        docs = replicated_docs(spark, SF_DIR, f).localCheckpoint()
        n = docs.count()
        cand = dedup.minhash_candidates(docs, n=3, max_bucket_size=64)
        cand.count()  # warm codegen for this width
        t0 = time.time()
        m = cand.count()
        print(f"{f:>6} {n:>9} {time.time()-t0:>11.2f}s {m:>8}")


if __name__ == "__main__":
    main()
