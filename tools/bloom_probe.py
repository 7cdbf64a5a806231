"""Bloom-prune probe (F36): replicate the events fact table and measure
how much of the fact-side join input the pre-shuffle Bloom filter removes,
and what that does to the join wall time — the explicit form of the
shuffle-reduction argument behind Spark's runtime bloom filter.

Selectivity setup: the dim side is ONE market segment (~20% of customers),
so ~80% of fact rows cannot match; the filter should remove nearly all of
them for a KB-sized broadcast (false positives bounded by (fill)^k).

Usage: python tools/bloom_probe.py [factor]   (default 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.operators import skew

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(factor: int = 20) -> None:
    spark = get_spark("bloom_probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, "events", SF_DIR).select("user_id", "value", "event_id")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    fact = ev.crossJoin(reps).select(
        "user_id", "value", (F.col("event_id") * factor + F.col("rep")).alias("event_id")
    ).localCheckpoint()
    cust = load_table(spark, "customer", SF_DIR).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    dimf = cust.where(F.col("c_mktsegment") == "BUILDING")

    n_fact = fact.count()
    bl = skew.bloom_build(dimf, "user_id", m_bits=16384, k_hashes=4)  # xxhash64 fast path
    pruned = skew.bloom_prune(fact, bl, "user_id", m_bits=16384, k_hashes=4)
    n_kept = pruned.count()
    n_true = fact.join(dimf, "user_id", "left_semi").count()

    def timed(df, shuffle: bool):
        # shuffle=True models the big-big regime the filter exists for:
        # broadcast disabled, the join shuffles BOTH sides on the key
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1" if shuffle else "10485760")
        t0 = time.time()
        df.join(dimf.hint("shuffle_hash") if shuffle else dimf, "user_id").agg(
            F.count("*"), F.sum(F.round(F.col("value") * 1000, 0).cast("long"))
        ).first()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        return round(time.time() - t0, 2)

    timed(fact, True)  # warm
    plain_sh = min(timed(fact, True) for _ in range(2))
    bloom_sh = min(timed(pruned, True) for _ in range(2))
    plain_bc = min(timed(fact, False) for _ in range(2))
    bloom_bc = min(timed(pruned, False) for _ in range(2))
    print(
        f"factor={factor} fact_rows={n_fact} kept_by_bloom={n_kept} "
        f"true_matches={n_true} false_positive_rows={n_kept - n_true} "
        f"prune_ratio={1 - n_kept / n_fact:.3f}"
    )
    print(f"SHUFFLE join+agg: plain={plain_sh}s bloom-pruned={bloom_sh}s")
    print(f"BROADCAST join+agg: plain={plain_bc}s bloom-pruned={bloom_bc}s "
          f"(broadcast is already the cheap filter — prune only pays before a shuffle)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
