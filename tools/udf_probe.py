"""Measure the three UDF tiers in BOTH execution regimes — the numbers
behind the repo's "builtins first, Arrow when Python is unavoidable,
row-UDFs never" rule, measured instead of assumed:

A. vector regime (cosine distance of every embedding vs one query):
   1. builtin — zip_with/aggregate column expressions. NOTE: higher-order
      functions are NOT whole-stage-codegen'd — they run in Catalyst's
      expression interpreter — so on dim-heavy inner loops Arrow+BLAS
      matches or BEATS them (measured: pandas 0.6-1.0× builtin at
      2M×64d across runs). The repo
      still prefers the expressions where results feed the exact oracle
      (deterministic left-to-right float order), and drops to blocked
      BLAS (cosine_neardup, PQ ADC) where throughput dominates.
   2. pandas — @pandas_udf, Arrow batches + numpy BLAS.
   3. row    — row-at-a-time Python UDF (the anti-pattern).

B. scalar regime (exact-cents revenue arithmetic over lineitem): the
   builtin expression is INSIDE WholeStageCodegen here, and the gap to
   Python is the classic one (row ≈ 3-10× slower; per-row overhead, not
   arithmetic, is the cost).

Usage: python tools/udf_probe.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.functions import vector as V


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    factor = int(os.environ.get("UDF_PROBE_FACTOR", "100"))
    spark = get_spark("udf-probe")
    base = load_table(spark, "embeddings", sf_dir)
    nb = base.count()
    # replicate so the measurement is compute-bound, not job-overhead-bound
    emb = (
        base.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
        .select((F.col("vec_id") + F.col("rep") * nb).alias("vec_id"), "embedding")
        .repartition(32)
        .localCheckpoint()
    )
    n = emb.count()
    q = emb.orderBy("vec_id").first()["embedding"]
    q_lit = F.array(*[F.lit(float(x)) for x in q])
    qv = np.asarray(q, dtype=np.float64)

    @F.pandas_udf(DoubleType())
    def cos_pandas(col: pd.Series) -> pd.Series:
        m = np.stack(col.values).astype(np.float64)
        sims = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv) + 1e-12)
        return pd.Series(1.0 - sims)

    qlist = [float(x) for x in q]
    qnorm = float(np.linalg.norm(qv))

    @F.udf(DoubleType())
    def cos_row(v):
        dot = na = 0.0
        for x, y in zip(v, qlist):
            dot += x * y
            na += x * x
        return float(1.0 - dot / ((na ** 0.5) * qnorm + 1e-12))

    variants = {
        "builtin": lambda: emb.select(V.cosine_distance("embedding", q_lit).alias("d")),
        "pandas": lambda: emb.select(cos_pandas("embedding").alias("d")),
        "row": lambda: emb.select(cos_row("embedding").alias("d")),
    }
    def run_block(title, variants, n_rows):
        results = {}
        print(f"-- {title} ({n_rows} rows)")
        for name, fn in variants.items():
            fn().agg(F.sum("d")).collect()  # warm codegen / python workers
            best = min(
                _timed(lambda: fn().agg(F.sum("d")).collect()) for _ in range(repeats)
            )
            results[name] = best
        base = results["builtin"]
        for name, t in results.items():
            print(f"{name:>8}: {t:6.3f}s  ({t / base:4.1f}x builtin)")
        return results

    run_block("A. vector regime: cosine vs one query (interpreted HOF vs Arrow)", variants, n)

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_extendedprice", "l_discount"
    ).localCheckpoint()
    n_li = li.count()

    @F.pandas_udf(DoubleType())
    def rev_pandas(p: pd.Series, d: pd.Series) -> pd.Series:
        return np.round(p * (1 - d) * 100)

    @F.udf(DoubleType())
    def rev_row(p, d):
        return float(round(p * (1 - d) * 100))

    scalar_variants = {
        "builtin": lambda: li.select(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).alias("d")
        ),
        "pandas": lambda: li.select(rev_pandas("l_extendedprice", "l_discount").alias("d")),
        "row": lambda: li.select(rev_row("l_extendedprice", "l_discount").alias("d")),
    }
    run_block("B. scalar regime: exact-cents revenue (WholeStageCodegen)", scalar_variants, n_li)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
