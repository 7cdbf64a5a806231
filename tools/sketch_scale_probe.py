"""Sketch-suite scale probe: replicate the events table N× (event ids
shifted; user ids shifted per replica so the key cardinality grows with
the data, the realistic regime) and time the frequency-sketch suite two
ways as N grows:

- raw:     HLL + AMS(×16 trials) + CMS(×4 rows) + exact-F2 + exact
           distinct, each fed from the raw event rows — the explodes
           multiply the EVENT count.
- preagg:  ONE per-(event_type, user_id) count materialized first, then
           every branch fed from it (weight_col / counts paths; values
           bit-identical — integer sums commute, hashes/signs depend
           only on the key) — the explodes multiply the KEY count.

Both must be linear in N (everything is scan + map-side-combinable
aggregate); the probe pins the preagg path's advantage factor, which
approaches (events/keys) × branches as keys ≪ events — the 100 TB
regime where each user has thousands of events.

Usage: python tools/sketch_scale_probe.py [factors...]   (default: 1 5 10)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.operators import sketches as SK

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_events(spark, sf_dir: str, factor: int):
    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "user_id")
    n = ev.count()
    u = ev.agg(F.max("user_id")).first()[0] + 1
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * n).alias("event_id"),
            "event_type",
            (F.col("user_id") + F.col("rep") * u).alias("user_id"),
        )
        .repartition(32)
        .localCheckpoint()  # probe the SKETCHES, not the replication join
    )


def suite_raw(ev):
    hll = SK.hll_distinct(ev, ["event_type"], "user_id", p=8)
    exact_d = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    ams = SK.ams_f2(ev, ["event_type"], "user_id", trials=16)
    f2 = SK.exact_f2(ev, ["event_type"], "user_id")
    hh = SK.cms_heavy_hitters(ev, "user_id")
    return hll, exact_d, ams, f2, hh


def suite_preagg(ev):
    kc = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    hll = SK.hll_distinct(kc, ["event_type"], "user_id", p=8)
    exact_d = kc.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    ams = SK.ams_f2(kc, ["event_type"], "user_id", trials=16, weight_col="cnt")
    f2 = SK.exact_f2(kc, ["event_type"], "user_id", weight_col="cnt")
    uc = kc.groupBy("user_id").agg(F.sum("cnt").alias("cnt"))
    hh = SK.cms_heavy_hitters(ev, "user_id", counts=uc)
    return hll, exact_d, ams, f2, hh


def run(build, ev) -> float:
    t0 = time.time()
    for df in build(ev):
        df.collect()
    return time.time() - t0


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("sketch-scale-probe")
    for factor in factors:
        ev = replicated_events(spark, SF_DIR, factor)
        n = ev.count()
        keys = ev.select("event_type", "user_id").distinct().count()
        # warm both paths once at the first factor to exclude JIT/codegen
        if factor == factors[0]:
            run(suite_raw, ev)
            run(suite_preagg, ev)
        raw = min(run(suite_raw, ev) for _ in range(2))
        pre = min(run(suite_preagg, ev) for _ in range(2))
        print(
            f"factor={factor:3d} events={n:9d} keys={keys:8d} "
            f"raw={raw:7.2f}s preagg={pre:7.2f}s speedup={raw / pre:5.2f}x",
            flush=True,
        )
        # localCheckpoint blocks are owned by the checkpointed RDD (not the
        # Dataset cache, so Dataset.unpersist() can't release them); drop
        # the reference and force a GC so the ContextCleaner frees the
        # blocks before the next factor measures
        del ev
        gc.collect()
        spark._jvm.System.gc()


if __name__ == "__main__":
    main()
