"""Skew mitigation operators (SURVEY.md §3 scale toolbox).

A hash-shuffled join collapses when one key holds a disproportionate share
of the fact rows: every row of the hot key lands on one reducer. AQE's
skew-join splitting handles sort-merge joins at runtime; ``salted_join``
is the explicit, planner-independent form — REWRITE the join so no single
(key, salt) cell can be hot, at the cost of replicating the (small) build
side ``salt`` times.

Results are provably identical to the unsalted join (exact-oracle checked
in ``__spark_entry__``): salting only refines the partitioning key, never
the join predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with ``salt``-way key splitting.

    The fact side gets a deterministic per-row salt (hash of ``salt_src``,
    a unique-ish fact column — defaults to ``key`` plus all fact columns'
    hash); the dim side is replicated once per salt value, so the shuffle
    key (key, _salt) splits each hot key across ``salt`` reducers.

    At 100 TB: ``salt`` scales with the observed skew ratio (hot-key rows /
    median-key rows); the dim replication cost is salt × |dim|, which stays
    broadcast-sized for dimension tables.

    Only fact-preserving join types are allowed: under 'right'/'full' the
    replicated dim side would emit every unmatched dim row once per salt
    value, silently breaking equivalence with the unsalted join.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
            "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — dim replication would "
            f"duplicate unmatched dim rows; use one of {sorted(safe)}"
        )
    src = F.col(salt_src) if salt_src else F.hash(*[F.col(c) for c in fact.columns])
    f = fact.withColumn("_salt", F.pmod(F.hash(src), F.lit(salt)))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
