"""Pair-dense dedup at sf2 (20× sf0.1, REMIXED docs — make_scale_data.py,
NOT replicas): the r10 verdict's item-2 scale point.

The pair-dense entries' cost is driven by PAIR DENSITY (Σ df² over join
keys), not corpus size, so doubling the corpus from sf1 is the honest
stress for:

1. ngram_jaccard — with and without the ``max_df_frac`` stop-shingle
   guard, to show the 100 TB knob's effect empirically (the guard drops
   join keys whose df² fan-out dominates while contributing no
   discrimination);
2. simhash_pairs (banded) — the r10 AQE coalesce-before-fan-out fix must
   hold when the signature aggregate EXCEEDS AQE's 1 MB min partition
   floor naturally (100k docs × 16 B ≈ 1.6 MB: the regime where the
   uncached plan would no longer collapse to one partition anyway — the
   persist must stay a win, not a wash);
3. minhash_candidates — bucket-bounded candidate generation.

Carries the bench's calibration protocol (fixed-work spin before/after
each factor) so timings are host-adjudicable.

Usage: python tools/pairdense_sf2_probe.py [sf_dirs...]
       (default: /root/testdata/sf0.1 /root/repo/.scale/sf1 /root/repo/.scale/sf2)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.operators import dedup


def calib() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(8_000_000):
        x += i
    assert x == 31999996000000
    return round(time.perf_counter() - t0, 3)


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scale/sf1",
        "/root/repo/.scale/sf2",
    ]
    spark = get_spark("pairdense-sf2-probe")
    hdr = (
        f"{'dir':>24} {'docs':>7} {'calib':>6} "
        f"{'ngram':>7} {'ngram_df.25':>11} {'pairs':>8} {'pairs_df':>9} "
        f"{'simhash':>8} {'minhash':>8} {'calib2':>7}"
    )
    print(hdr)
    for d in dirs:
        docs = load_table(spark, "documents", d).localCheckpoint()
        n = docs.count()
        c0 = calib()

        def run_ngram(df_frac):
            out = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2,
                                            max_df_frac=df_frac)
            return out.count()

        # warm each shape once, then best-of-2
        n_pairs = run_ngram(None)
        t_ng = timed(lambda: run_ngram(None))
        n_pairs_df = run_ngram(0.25)
        t_ng_df = timed(lambda: run_ngram(0.25))

        sh = dedup.simhash_neardup_pairs_banded(docs, bits=32, max_hamming=3)
        sh.count()
        t_sh = timed(lambda: dedup.simhash_neardup_pairs_banded(
            docs, bits=32, max_hamming=3).count())

        mh = dedup.minhash_candidates(docs, n=3, max_bucket_size=64)
        mh.count()
        t_mh = timed(lambda: dedup.minhash_candidates(
            docs, n=3, max_bucket_size=64).count())

        c1 = calib()
        print(
            f"{d:>24} {n:>7} {c0:>6.3f} "
            f"{t_ng:>7.2f} {t_ng_df:>11.2f} {n_pairs:>8} {n_pairs_df:>9} "
            f"{t_sh:>8.2f} {t_mh:>8.2f} {c1:>7.3f}"
        )
        dedup.release_dedup_caches()


if __name__ == "__main__":
    main()
