"""bench.py headline-line contract: ONE JSON line ≤ 1900 chars with a
STABLE itemized query set (r12, VERDICT r11 item 2 — the pre-r12
slowest-N fold reshuffled which queries were named whenever timings
drifted or an entry was added, producing spurious dropped_from_bench
verdicts in the driver's round-over-round diff)."""

import json
import random

import bench


def _final(timings):
    return {
        "metric": "headline_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "value_cold": 159.25,
        "value_r2_subset": 57.35,
        "latency": {"warm_min_total": 110.59, "warm_max_total": 133.3},
        "host": {"calib_max": 0.344, "load1_max": 8.8},
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": 0.1,
    }


def _bench_timings(seed=0):
    """75 entries shaped like the real bench: the 61 pinned keys plus 14
    extras, values in the real 0.3-8 s band."""
    rng = random.Random(seed)
    names = sorted(bench.PINNED_ITEMIZED) + [f"extra_entry_{i:02d}" for i in range(14)]
    return {n: rng.uniform(0.3, 8.0) for n in names}


def test_pinned_fold_is_stable_and_fits():
    timings = _bench_timings()
    line = bench._fit_final_line(_final(timings), timings)
    assert len(line) <= 1900
    q = json.loads(line)["queries"]
    itemized = set(q) - {"_other_sum"}
    # the itemized set is EXACTLY the pinned keys — independent of timings
    assert itemized == set(bench.PINNED_ITEMIZED)
    assert "scd2_orders" in itemized  # the r11 casualty, by name
    other = sum(v for k, v in timings.items() if k not in bench.PINNED_ITEMIZED)
    assert abs(q["_other_sum"] - other) < 0.05
    # totals preserved through the fold (rounding tolerance)
    assert abs(sum(q.values()) - sum(timings.values())) < 0.5


def test_itemized_set_invariant_under_drift_and_additions():
    t1 = _bench_timings(seed=1)
    # a drifted run with two NEW entries must itemize the same key set
    t2 = {k: v * 1.2 for k, v in _bench_timings(seed=2).items()}
    t2["brand_new_entry"] = 9.9
    t2["another_new_one"] = 0.1
    q1 = json.loads(bench._fit_final_line(_final(t1), t1))["queries"]
    q2 = json.loads(bench._fit_final_line(_final(t2), t2))["queries"]
    assert set(q1) == set(q2), "itemized key set must not depend on timings"


def test_small_map_passes_through_unfolded():
    timings = {f"q{i}": 1.0 for i in range(10)}
    q = json.loads(bench._fit_final_line(_final(timings), timings))["queries"]
    assert set(q) == set(timings), "a fitting map must not be folded"
