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


def cost_crossover_threshold(n_corpus: int, k: int = 10, expansion: int = 4) -> float:
    """Predicted-cost crossover between prefilter and postfilter (parity:
    ``compute_query_time`` AnonySys_dynamic_partition.py:114 — strategy
    choice by predicted time, not a fixed magic threshold).

    Under the fitted linear scan model t = a·x + b (D9), prefilter scans
    x = sel·N permitted rows; postfilter scans the global ranking until k
    permitted rows surface, x ≈ k·expansion/sel in expectation. With the
    same (a, b) on both sides the argmin reduces to comparing scan
    counts, and the crossover is sel* = sqrt(k·expansion / N): above it
    the permitted set is dense enough that rescanning the global layout
    is cheaper than materializing the permission semi-join. The threshold
    ADAPTS to corpus size — bigger corpora push the crossover down,
    which a fixed 0.5 never does."""
    return (k * expansion / max(n_corpus, 1)) ** 0.5


def choose_strategy(selectivity: float, has_partition_layout: bool = False,
                    postfilter_threshold: float = 0.5, partition_threshold: float = 0.05) -> str:
    if selectivity >= postfilter_threshold:
        return "postfilter"
    if has_partition_layout and selectivity <= partition_threshold:
        return "comb_partition"
    return "prefilter"


def strategy_routing(
    queries: DataFrame,
    selectivity: DataFrame,
    has_partition_layout: bool = False,
    postfilter_threshold: float = 0.5,
    partition_threshold: float = 0.05,
) -> DataFrame:
    """query_id → strategy as a DataFrame (the declarative mirror of
    :func:`choose_strategy`) — dim-sized, broadcast into each branch so the
    routing never round-trips through the driver (no Q-row collect, no
    IN-literal plans; at large Q the old literal list would blow up the plan
    and serialize the driver)."""
    s = F.coalesce(F.col("selectivity"), F.lit(0.0))
    strat = F.when(s >= postfilter_threshold, F.lit("postfilter"))
    if has_partition_layout:
        strat = strat.when(s <= partition_threshold, F.lit("comb_partition"))
    return (
        # selectivity is a per-user aggregate (dim-sized) — broadcast it so
        # the routing join never sort-merges
        queries.join(F.broadcast(selectivity), "user_id", "left")
        .select("query_id", strat.otherwise(F.lit("prefilter")).alias("strategy"))
    )


def adaptive_knn(
    blocks: DataFrame,
    queries: DataFrame,
    query_roles: DataFrame,
    permission_assignment: DataFrame,
    user_roles: DataFrame,
    k: int = 10,
    metric: str = "l2",
    has_partition_layout: bool = False,
    routing_mode: str = "cost",
    expansion: int = 4,
) -> DataFrame:
    """Route each query to the strategy its selectivity warrants, then union.

    Selectivity is computed set-at-a-time (one aggregate for all users,
    reused across the workload — the reference recomputes per query), and the
    routing stays a DataFrame: each branch semi-joins its broadcast slice of
    the routing table, so the plan carries no per-query literals.

    ``routing_mode='cost'`` (default) derives the prefilter/postfilter
    threshold from the predicted-cost crossover sel* = sqrt(k·e/N)
    (:func:`cost_crossover_threshold` — compute_query_time parity);
    ``'threshold'`` keeps the fixed 0.5 rule.
    """
    sel = block_selectivity(user_roles, permission_assignment, blocks)
    pf_threshold = (
        cost_crossover_threshold(blocks.count(), k=k, expansion=expansion)
        if routing_mode == "cost"
        else 0.5
    )
    routing = strategy_routing(queries, sel, has_partition_layout,
                               postfilter_threshold=pf_threshold)

    impl = {
        "prefilter": knn.knn_prefilter,
        "postfilter": knn.knn_postfilter,
    }
    if has_partition_layout:
        impl["comb_partition"] = knn.knn_comb_role_partition

    outs = []
    for strat, fn in impl.items():
        qids = F.broadcast(routing.where(F.col("strategy") == strat).select("query_id"))
        qs = queries.join(qids, "query_id", "left_semi")
        qr = query_roles.join(qids, "query_id", "left_semi")
        outs.append(
            fn(blocks, qs, qr, permission_assignment, k=k, metric=metric)
            .withColumn("strategy", F.lit(strat))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
