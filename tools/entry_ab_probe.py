"""Time named bench entries with the bench's _force methodology: one cold
pass then n warm passes per entry (interleaved across the list), printing
per-entry warm samples + min. For in-session A/B between two code trees.

Usage: python tools/entry_ab_probe.py <sf_dir> <label> <n_warm> <name> [name ...]
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
    t0 = time.perf_counter()
    x = 0
    for i in range(8_000_000):
        x += i
    assert x == 31999996000000
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir, label, n_warm = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    spark = get_spark(f"entry-ab-{label}")
    spark.range(1).count()
    qs = entry.queries()
    fns = {n: (bench.EXTRA.get(n) or qs[n]) for n in names}
    c0 = _calibrate()
    warm: dict[str, list[float]] = {n: [] for n in names}
    cold: dict[str, float] = {}
    for p in range(n_warm + 1):
        for n in names:
            t0 = time.time()
            bench._force(fns[n](spark, sf_dir))
            el = round(time.time() - t0, 3)
            if p == 0:
                cold[n] = el
            else:
                warm[n].append(el)
    c1 = _calibrate()
    for n in names:
        print(f"{label} {n}: cold={cold[n]} warm={warm[n]} min={min(warm[n])}")
    print(f"{label} calib=[{c0},{c1}] load1={os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
