"""Dedup scale probe: replicate the documents table N× (ids shifted, a
replica marker token appended so replicas aren't exact dupes) and time
five dedup pipelines as N grows — MinHash+LSH candidates, duplicated-
substring stats (content-defined sampling), EXACTSUBSTR span removal
(full-window cut; work downstream of the hash join ∝ duplicated
positions), incremental new-batch screening (batch size ∝ N/5, index
∝ N), and SemDeDup cluster-scoped pairs over replicated embeddings
(cluster count grows with N so cluster size — and thus per-task work —
stays constant). Linear growth = the pipeline is scan-shaped;
superlinear growth would mean a hidden self-join or unbounded
bucket/cluster blowup.

CAVEAT for exactsubstr on REPLICATED data: every 40-char window interior
to a replica is shared across replicas, so at factor N nearly the whole
corpus is "duplicated" — the join-back row count is ∝ corpus size, the
worst case. Still must scale linearly.

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


def replicated_embeddings(spark, sf_dir: str, factor: int):
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
        # perturb one dim per replica so replicas aren't identical vectors
        F.transform(
            "embedding", lambda x, i: x + F.when(i == F.col("rep") % 64, 0.01).otherwise(0.0)
        ).alias("embedding"),
    )


def main() -> None:
    from vectorsearch_rbac_spark.operators import ann

    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("dedup-scale-probe")
    print(f"{'factor':>6} {'docs':>9} {'minhash':>9} {'dupwin':>9} {'exsubstr':>9} {'incr':>9} {'semdedup':>9}")
    for f in factors:
        docs = replicated_docs(spark, SF_DIR, f).localCheckpoint()
        emb = replicated_embeddings(spark, SF_DIR, f).localCheckpoint()
        n = docs.count()
        emb.count()

        cand = dedup.minhash_candidates(docs, n=3, max_bucket_size=64)
        cand.count()  # warm codegen for this width
        t0 = time.time(); cand.count(); t_mh = time.time() - t0

        # agg over the weight column forces the full pipeline — a bare
        # count() lets Catalyst eliminate the unique-key outer join
        dw = dedup.dup_window_stats(docs, win=40, sample_mod=8)
        dw.agg(F.sum("dup_frac")).collect()
        t0 = time.time(); dw.agg(F.sum("dup_frac")).collect(); t_dw = time.time() - t0

        ec = dedup.exactsubstr_cut(docs, win=40)
        ec.agg(F.sum("n_dup_chars")).collect()
        t0 = time.time(); ec.agg(F.sum("n_dup_chars")).collect(); t_ec = time.time() - t0

        ic = dedup.incremental_dedup_pairs(docs, mod=5, rem=4)
        ic.count()
        t0 = time.time(); ic.count(); t_ic = time.time() - t0

        # clusters ∝ N keeps per-cluster pair work constant
        sd = ann.semdedup_pairs(emb, n_clusters=max(8, 8 * f), threshold=0.3,
                                anchor_stride=7)
        sd.count()
        t0 = time.time(); sd.count(); t_sd = time.time() - t0
        print(f"{f:>6} {n:>9} {t_mh:>8.2f}s {t_dw:>8.2f}s {t_ec:>8.2f}s {t_ic:>8.2f}s {t_sd:>8.2f}s")


if __name__ == "__main__":
    main()
