"""A/B probe for the tfidf_top_terms sf1 riser (r10 VERDICT item 3).

Times q_tfidf_only with the bench's own _force + calibration methodology:
one cold pass, then N warm passes, reporting every sample so two code
trees run alternately can be compared within-session.

Usage: python tools/tfidf_ab_probe.py <sf_dir> [label] [n_warm]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entry
from vectorsearch_rbac_spark.sources import get_spark


def _calibrate() -> float:
    # r9's bench.py predates _calibrate; carry the identical spin here
    t0 = time.perf_counter()
    x = 0
    for i in range(8_000_000):
        x += i
    assert x == 31999996000000
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else "head"
    n_warm = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(f"tfidf-ab-{label}")
    spark.range(1).count()
    c0 = _calibrate()
    fn = entry.q_tfidf_only
    t0 = time.time()
    bench._force(fn(spark, sf_dir))
    cold = time.time() - t0
    warm = []
    for _ in range(n_warm):
        t0 = time.time()
        bench._force(fn(spark, sf_dir))
        warm.append(round(time.time() - t0, 3))
    c1 = _calibrate()
    print(
        f"tfidf_ab {label}: cold={cold:.3f} warm={warm} min={min(warm):.3f} "
        f"calib=[{c0},{c1}] load1={os.getloadavg()[0]:.2f}"
    )


if __name__ == "__main__":
    main()
