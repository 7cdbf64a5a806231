"""Adaptive strategy selection for RBAC vector search (SURVEY.md §2 D5).

Parity: the ACORN line of work in the reference
(``controller/dynamic_partition/acorn/AnonySys_dynamic_partition.py``) makes
search predicate-aware — how much of the data a user's predicate keeps
decides how to search. The reference benchmarks fixed strategies against
each other (``basic_benchmark/test_all.py``); this module encodes the
decision rule so a single entry point picks the plan:

- selectivity ≥ ``postfilter_threshold``: permitted blocks are dense among
  global neighbors → **postfilter** (global ANN + filter) wins: it scans the
  (indexed/pruned) global layout once.
- selectivity small: **prefilter** (permission semi-join first) wins: the
  distance math runs on a small slice.
- selectivity tiny and a comb-role layout exists: **partition** search is
  best — one pruned partition.

Costs follow the pgvector-style model (rows-scanned dominated); thresholds
are tunable and the choice is logged in the plan via an added literal column
so tests/bench can assert which path ran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import knn
from ..rbac.derive import block_selectivity


def choose_strategy(selectivity: float, has_partition_layout: bool = False,
                    postfilter_threshold: float = 0.5, partition_threshold: float = 0.05) -> str:
    if selectivity >= postfilter_threshold:
        return "postfilter"
    if has_partition_layout and selectivity <= partition_threshold:
        return "comb_partition"
    return "prefilter"


def adaptive_knn(
    blocks: DataFrame,
    queries: DataFrame,
    query_roles: DataFrame,
    permission_assignment: DataFrame,
    user_roles: DataFrame,
    k: int = 10,
    metric: str = "l2",
    has_partition_layout: bool = False,
) -> DataFrame:
    """Route each query to the strategy its selectivity warrants, then union.

    Selectivity is computed set-at-a-time (one aggregate for all users,
    reused across the workload — the reference recomputes per query).
    """
    sel = block_selectivity(user_roles, permission_assignment, blocks)
    q_sel = queries.join(sel, "user_id", "left").fillna({"selectivity": 0.0})
    rows = q_sel.select("query_id", "selectivity").collect()  # Q rows, driver-tiny
    buckets: dict[str, list[int]] = {}
    for r in rows:
        s = choose_strategy(r["selectivity"], has_partition_layout)
        buckets.setdefault(s, []).append(r["query_id"])

    outs = []
    impl = {
        "prefilter": knn.knn_prefilter,
        "postfilter": knn.knn_postfilter,
        "comb_partition": knn.knn_comb_role_partition,
    }
    for strat, qids in buckets.items():
        qs = queries.where(F.col("query_id").isin(qids))
        qr = query_roles.where(F.col("query_id").isin(qids))
        outs.append(
            impl[strat](blocks, qs, qr, permission_assignment, k=k, metric=metric)
            .withColumn("strategy", F.lit(strat))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
