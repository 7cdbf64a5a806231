"""Build BASELINE_sf1.md from an sf1 bench JSON line + the sf0.1 anchor.

Every entry gets its sf1/sf0.1 wall ratio and an expected-shape class:

- ``linear``  — work ∝ data (dedup, text, TPC-H, streaming, storage):
  expect ≈ 10× at factor 10; > ~20× flags a superlinear leak.
- ``pairs``   — work ∝ blocks × queries (every brute-force / scan / ANN
  search entry: the driver workload grows queries WITH the corpus —
  every 100th embedding is a query — so 10× data = 100× scored pairs):
  expect anywhere up to ≈ 100×, and BLAS-bound entries land well under.
- ``fixed+``  — mostly fixed-cost at this scale (tiny dims, plan
  overhead): ratios are noise.

Usage: python tools/sf1_report.py <sf1_bench_json_line_file> <r_anchor.json>
"""

from __future__ import annotations

import json
import sys

PAIRS = {
    "rbac_prefilter_topk", "rbac_postfilter_topk", "rbac_comb_role_topk",
    "rbac_logical_role_topk", "rbac_dynamic_topk", "rbac_dynamic_budget_topk",
    "rbac_topk_fast", "rbac_prefilter_zipf_topk", "sharing_tree_rbac_topk",
    "cosine_topk", "hamming_topk", "sparse_cosine_topk", "halfvec_topk",
    "int8_topk", "bm25_topk", "rbac_bm25_topk", "hybrid_rrf_topk",
    "mmr_topk", "maxsim_topk", "ivf_recall", "pq_recall", "ivfpq_recall",
    "graph_recall", "rbac_graph_recall", "acorn_recall", "acorn_gamma_recall",
    "tuning_curve",
}
FIXED = {"generator_relations", "pricing_summary", "nation_volume",
         "daily_type_pivot", "events_json_stats", "time_rollup",
         "revenue_rollup", "shipping_priority"}


def shape(name: str) -> str:
    if name in PAIRS:
        return "pairs"
    if name in FIXED:
        return "fixed+"
    return "linear"


def main() -> None:
    sf1 = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    anchor = json.loads(open(sys.argv[2]).read())
    if "tail" in anchor:  # driver BENCH_r{N}.json wraps the line in a tail
        anchor = json.loads(anchor["tail"].strip().splitlines()[-1])
    a_q = anchor.get("queries", anchor)
    rows = []
    for name, v1 in sorted(sf1["queries"].items()):
        if name.startswith("_"):
            continue
        v0 = a_q.get(name)
        ratio = round(v1 / v0, 1) if v0 else None
        rows.append((name, v0, v1, ratio, shape(name)))
    flags = [r for r in rows if r[4] == "linear" and r[3] and r[3] > 20]
    print("| entry | sf0.1 s | sf1 s | ratio | expected shape |")
    print("| --- | --- | --- | --- | --- |")
    for name, v0, v1, ratio, sh in rows:
        mark = " ⚠" if (name, v0, v1, ratio, sh) in flags else ""
        print(f"| {name} | {v0} | {v1} | {ratio}×{mark} | {sh} |")
    print()
    print(f"sf1 warm total: {sf1['value']} s over {len(rows)} entries "
          f"(sf0.1 anchor total {anchor.get('value')}); "
          f"linear-shape entries over 20x: {len(flags)}")


if __name__ == "__main__":
    main()
