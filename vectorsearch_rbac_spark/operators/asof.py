"""As-of (point-in-time) join — a canonical operator Spark's DataFrame API
lacks (SURVEY.md §2 F16). Each left row matches the most recent right row
with the same key and right_ts <= left_ts (backward direction).

Implementation is the union-window technique, NOT a range join: tag both
sides, sort each key's timeline once, and carry the latest right payload
forward with ``last(ignorenulls)`` over an unbounded-preceding window.
One shuffle on the key, O(n log n) per key partition, no (left × right)
candidate explosion — the shape that survives a 100 TB timeline. (A
range-join formulation explodes to |left|·|right| per key before
filtering; the union-window never materializes a cross product.)

DuckDB has native ASOF JOIN, which is the oracle — the operator is
exact-checked against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_trailing(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    payload_cols: list[str],
) -> DataFrame:
    """Range join (F17): pair each left row with every right row of the same
    key where right_ts ∈ (left_ts - window, left_ts] — "events joined to the
    orders of the trailing week".

    The scalable shape: both sides bucket time into epochs of exactly
    ``window_seconds``; a trailing window then spans at most 2 epochs, so
    the right side is duplicated into (epoch, epoch+1) and the join is a
    pure equi-join on (key, epoch) — bounded ×2 blowup — with the precise
    interval predicate applied AFTER co-location. A naive inequality join
    is a per-key cross product; this never materializes one.
    """
    le = left.withColumn("_epoch", F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds))
    r0 = right.select(
        F.col(key), F.col(right_ts).alias("_rts"), *payload_cols
    ).withColumn("_repoch", F.floor(F.unix_timestamp(F.col("_rts")) / window_seconds))
    re = r0.withColumn("_epoch", F.explode(F.array(F.col("_repoch"), F.col("_repoch") + 1))).drop("_repoch")
    j = le.join(re, [key, "_epoch"])
    # the precise predicate compares raw timestamps (sub-second exact);
    # the epoch bucket above was only for co-location
    lo = F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS")
    return (
        j.where((F.col("_rts") <= F.col(left_ts)) & (F.col("_rts") > lo))
        .drop("_epoch", "_rts")
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of-backward join: every ``left`` row, plus ``payload_cols``
    from the latest ``right`` row of the same ``key`` with right_ts <=
    left_ts (null payload when no prior right row exists).

    ``right`` must be unique per (key, right_ts) — pre-aggregate it if not,
    or the matched payload at a tied timestamp is ambiguous.
    """
    lt = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    rt = (
        right.select(F.col(key), F.col(right_ts).alias("_ats"), *payload_cols)
        .withColumn("_tag", F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # rights sort before lefts at equal timestamps (tag 0 < 1) so the match
    # is inclusive (right_ts == left_ts matches)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in payload_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.where(F.col("_tag") == 1).drop("_tag", "_ats")
