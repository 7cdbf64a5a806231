"""Probe: local_topk query-axis chunking at production query counts.

r9 verdict watch item: the per-batch distance matrix was (batch_rows x Q)
float64 with no cap — ~GBs per Arrow batch at Q = 10^4. r10 chunks the
query axis at a ~32 MB budget. This probe demonstrates, at Q = 5000 with
the corpus collapsed to ONE scan partition (so the Arrow batch is as wide
as it gets):

1. the auto-chunked kernel returns EXACTLY the same rows as a forced
   single-chunk run (row-identity, the pytest pin at probe scale);
2. the chunk step the budget picks, the implied per-chunk matrix bytes
   (bounded at ~32 MB by construction), and what the UNCHUNKED matrix
   would have been;
3. wall time for both (chunking is not a slowdown).

Usage: python tools/qchunk_probe.py [sf_dir] [n_queries]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = get_spark("qchunk_probe")
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    blocks = derive.derive_rbac(cust, docs, emb)["documentblocks"]
    # widest possible Arrow batches: one scan partition
    blocks1 = blocks.repartition(1).localCheckpoint()
    n_rows = blocks1.count()

    # deterministic Q=n_q workload: replicate each embedding r times with a
    # tiny per-replica shift (pure expressions, no host randomness)
    reps = n_q // emb.count() + 1
    queries = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(spark.range(reps).select(F.col("id").alias("r"))))
        .select(
            (F.col("vec_id") * 100 + F.col("r")).alias("query_id"),
            F.transform(
                "embedding", lambda x: x + F.col("r").cast("double") * 0.001
            ).alias("query_vector"),
        )
        .orderBy("query_id")
        .limit(n_q)
        .localCheckpoint()
    )
    q = queries.count()

    arrow_batch = 10000  # spark.sql.execution.arrow.maxRecordsPerBatch default
    n_batch = min(n_rows, arrow_batch)
    budget = 32 << 20
    step = max(1, budget // (8 * n_batch))
    print(f"corpus rows={n_rows} (one partition), Q={q}")
    print(f"auto chunk step={step} queries -> per-chunk matrix "
          f"{n_batch * min(step, q) * 8 / 2**20:.1f} MiB (budget 32 MiB); "
          f"unchunked would be {n_batch * q * 8 / 2**20:.1f} MiB")

    t0 = time.time()
    a = sorted(map(tuple, knn.local_topk(blocks1, queries, 10).collect()))
    t_auto = time.time() - t0
    t0 = time.time()
    b = sorted(map(tuple, knn.local_topk(blocks1, queries, 10, q_chunk=1 << 30).collect()))
    t_one = time.time() - t0
    print(f"rows auto={len(a)} single_chunk={len(b)} identical={a == b}")
    print(f"wall auto-chunked={t_auto:.2f}s single-chunk={t_one:.2f}s")
    assert a == b and len(a) == q * 10
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
