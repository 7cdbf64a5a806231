"""Scale probe for the r4 curation/retrieval additions: replicate the
documents (and events) N× and time four new operators as N grows.

Expected shapes — and what a violation would mean at 100 TB:
- chunk_documents: pure narrow map (no shuffle) → wall time ~linear in
  corpus; superlinear would mean a hidden shuffle or explode blowup.
- build_vocab: one term-shuffle with map-side combine + TakeOrdered top-V
  → ~linear scan cost, merge bounded by V; superlinear would mean the
  top-V became a global sort.
- funnel_steps + cohort_retention (events replicated with shifted ids and
  users): per-step/user keyed aggregates → ~linear.
- mmr_topk: candidate generation is the only corpus-sized stage; the k−1
  greedy iterations run over (queries × n_candidates) rows REGARDLESS of
  corpus size → wall time should grow far slower than the corpus (fixed
  iteration overhead + linear scan).

Usage: python tools/curation_scale_probe.py [factors...]   (default: 1 5 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.operators import curation, retrieval

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, n, id_cols):
    parts = []
    for i in range(n):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * 10_000_000))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def timed(fn):
    t0 = time.time()
    n = fn().count()
    return round(time.time() - t0, 2), n


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("curation-scale-probe")
    docs0 = load_table(spark, "documents", SF_DIR)
    ev0 = load_table(spark, "events", SF_DIR)
    emb0 = load_table(spark, "embeddings", SF_DIR)
    queries = emb0.where(F.col("vec_id") % 100 == 0).limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    ).localCheckpoint()
    for n in factors:
        docs = replicate(docs0, n, ["doc_id"])
        ev = replicate(ev0, n, ["event_id", "user_id"])
        emb = replicate(emb0, n, ["vec_id"])
        t_chunk, n_chunk = timed(lambda: curation.chunk_documents(docs, 64, 16))
        t_vocab, n_vocab = timed(lambda: curation.build_vocab(docs, vocab_size=256))
        from vectorsearch_rbac_spark.plans import queries as PQ
        t_funnel, _ = timed(lambda: PQ.funnel_steps(ev))
        t_cohort, n_coh = timed(lambda: PQ.cohort_retention(ev))
        t_mmr, n_mmr = timed(lambda: retrieval.mmr_topk(emb, queries, k=5, n_candidates=20))
        print(
            f"x{n}: docs={docs.count()} chunks={n_chunk} "
            f"chunk={t_chunk}s vocab={t_vocab}s funnel={t_funnel}s "
            f"cohort={t_cohort}s (cells={n_coh}) mmr={t_mmr}s"
        )


if __name__ == "__main__":
    main()
