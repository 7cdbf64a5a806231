"""Mergeable sketch operators (SURVEY.md §2 F24-F26): fixed-size
distributed summaries for distinct counts, frequencies, and second
moments — the 100 TB answer when exact per-key state no longer fits.

Three classic sketches, each expressed as a pure DataFrame plan whose
state is a SMALL, MERGEABLE aggregate (map-side combinable, constant
size per group regardless of input rows):

- HyperLogLog distinct counting (Flajolet, Fusy, Gandouet, Meunier 2007)
- Count-Min frequency estimation / heavy hitters (Cormode &
  Muthukrishnan 2005)
- AMS F2 second-moment estimation (Alon, Matias, Szegedy 1996)

Determinism contract (SURVEY.md §4): all hashing is ``md5_long`` (first
15 hex digits of md5 → BIGINT), so every register, counter, and sign is
reproducible cross-engine and the DuckDB oracle replays the sketches
bit-for-bit — an *approximate* estimator under the *exact* hash gate.
Harmonic sums are kept in scaled-integer space (Σ 2^(53-ρ) as BIGINT)
so no float accumulation order can differ between engines; the only
floats are single divisions and one ln(), rounded to 6 dp.

Scale notes: a sketch groupBy carries at most (groups × m) rows through
the shuffle with full map-side partial aggregation — for 100 TB of
events the HLL shuffle is 256 rows per group, the CMS shuffle
depth×width rows total. Compare the exact paths (countDistinct's double
shuffle, a full per-key count) which scale with key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 60-bit md5_long hashes: bucket = h mod m, rho = leading zeros of the
# remaining (60-p)-bit suffix + 1, so rho ∈ [1, 61-p].
_HASH_BITS = 60
# Harmonic-sum scale: Σ 2^(_SCALE - rho) stays exact in BIGINT
# (rho ≤ 53 for p ≥ 8 → terms ≤ 2^52; 2^p terms + V·2^53 < 2^62).
_SCALE = 53


def _h60(col) -> F.Column:
    """md5_long inline (kept local so the SQL oracle string and this plan
    visibly share one formula)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _alpha(m: int) -> float:
    """HLL bias constant for m ≥ 128 (Flajolet et al. 2007, fig. 3)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str, p: int = 8) -> DataFrame:
    """Per-group HLL register table: (group, bucket, rho) with
    rho = max over keys hashing into the bucket.

    This IS the sketch: at most 2^p rows per group, built with one
    map-side-combinable max aggregate. Register tables from disjoint
    data unite by groupBy(bucket).max(rho) — the mergeability that makes
    HLL the cross-partition/cross-day distinct-count currency.
    """
    m = 1 << p
    h = _h60(F.col(key_col).cast("string"))
    rest = F.shiftright(h, p)  # (60-p)-bit suffix; shiftright is exact (no double div)
    rho = (
        F.when(rest == 0, F.lit(_HASH_BITS - p + 1))
        .otherwise(F.lit(_HASH_BITS - p + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    return (
        df.select(*group_cols, F.pmod(h, F.lit(m)).cast("long").alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_distinct(df: DataFrame, group_cols: list[str], key_col: str, p: int = 8) -> DataFrame:
    """Per-group HLL distinct-count estimate with the standard small-range
    correction: linear counting m·ln(m/V) when the raw estimate ≤ 2.5m
    and empty buckets remain, else the raw harmonic-mean estimate.

    Emits the register-state integers alongside the estimate so a
    correctness gate pins the full sketch state, not just the rounded
    float: ``s_scaled`` = Σ 2^(53-ρ) over present buckets + V·2^53
    (exact BIGINT — float accumulation never happens), ``v_zero`` =
    number of empty buckets.
    """
    m = 1 << p
    alpha = _alpha(m)
    regs = hll_registers(df, group_cols, key_col, p)
    agg = regs.groupBy(*group_cols).agg(
        # shiftleft with a column shift count (the python helper only takes
        # an int literal): Σ 2^(53-ρ) stays in exact BIGINT space
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SCALE} - rho)")).alias("s_present"),
        F.count("*").alias("n_buckets"),
    )
    v = (F.lit(m) - F.col("n_buckets")).cast("long")
    s_scaled = (F.col("s_present") + v * F.lit(1 << _SCALE).cast("long")).cast("long")
    # raw = alpha·m²/S with S = s_scaled/2^53: one double division (IEEE-identical
    # cross-engine); linear counting's ln() is the only libm call → 6 dp.
    raw = F.lit(alpha * m * m * float(1 << _SCALE)) / s_scaled.cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.round(F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw), 6)
    return agg.select(
        *group_cols,
        v.alias("v_zero"),
        s_scaled.alias("s_scaled"),
        est.alias("hll_est"),
    )


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch: a (depth × width) counter grid as a DataFrame of
    (row, cell, cnt) — depth·width rows TOTAL however large the input,
    built by one map-side-combinable count. Row i hashes keys with salt
    ``cms:i`` so the d hash functions are independent md5 draws.
    Sketches merge by groupBy(row, cell).sum(cnt).

    ``weight_col`` feeds the sketch from a PRE-COUNTED (key, weight)
    table instead of raw rows: cell counters become Σ weight, which is
    bit-identical to counting the raw rows (integer sums) while the
    explode×depth runs over distinct keys, not events — the shape a
    shared per-key aggregate buys at 100 TB.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w")
    keyed = df.select(F.col(key_col).cast("string").alias("k"), w).select("k", "w", rows)
    cell = F.pmod(_h60(F.concat_ws(":", F.lit("cms"), F.col("row").cast("string"), F.col("k"))), F.lit(width))
    return (
        keyed.select("row", cell.cast("long").alias("cell"), "w")
        .groupBy("row", "cell")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each candidate key: est = min over the
    d counters the key hashes to (CMS guarantees est ≥ true count).

    The sketch side is depth·width rows → broadcast; candidates stay
    distributed, so querying 10^9 keys is a broadcast join + keyed min,
    never a shuffle of the grid.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    cand = keys.select(F.col(key_col).cast("string").alias("k")).select("k", rows)
    cell = F.pmod(_h60(F.concat_ws(":", F.lit("cms"), F.col("row").cast("string"), F.col("k"))), F.lit(width))
    cand = cand.select("k", "row", cell.cast("long").alias("cell"))
    return (
        cand.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("k")
        .agg(F.min("cnt").alias("cms_est"))
        .select(F.col("k").alias(key_col), "cms_est")
    )


def cms_heavy_hitters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256, num: int = 6, den: int = 5,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Heavy hitters via CMS: keys whose estimated count ≥ threshold,
    with the exact count joined in for the (est ≥ exact) guarantee.

    The threshold is scale-relative and integer-exact cross-engine:
    1 + (num·N) div (den·U) for N rows / U distinct keys — i.e. keys
    ≥ ~(num/den)× the mean frequency. No false negatives: est ≥ exact,
    so every key with exact ≥ threshold survives the est-filter.

    ``counts`` short-circuits the raw scan with a pre-counted
    (key_col, cnt) table — one row per key: the sketch is fed weighted,
    the exact side IS the table, and the totals are Σ cnt / row count.
    Values are bit-identical to the raw path (integer sums commute).
    """
    if counts is not None:
        sketch = cms_sketch(counts, key_col, depth, width, weight_col="cnt")
        exact = counts.select(
            F.col(key_col).cast("string").alias("k"),
            F.col("cnt").cast("long").alias("exact_cnt"),
        )
        totals = counts.agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            # count(col), not count(*): a NULL-key group must not count —
            # mirrors the raw path's countDistinct (distinct NON-NULL keys)
            F.count(F.col(key_col)).cast("long").alias("n_keys"),
        )
    else:
        sketch = cms_sketch(df, key_col, depth, width)
        exact = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(F.count("*").alias("exact_cnt"))
        totals = df.agg(
            F.count("*").alias("n_rows"), F.countDistinct(F.col(key_col).cast("string")).alias("n_keys")
        )
    est = cms_point_estimates(sketch, exact.select(F.col("k").alias(key_col)), key_col, depth, width)
    # integer-exact threshold both engines: 1 + floor(num·N / (den·U))
    thr = F.lit(1).cast("long") + F.floor((F.lit(num) * F.col("n_rows")) / (F.lit(den) * F.col("n_keys"))).cast("long")
    return (
        est.join(exact, est[key_col] == exact["k"]).drop("k")
        .crossJoin(F.broadcast(totals.select(thr.alias("thr"))))
        .where(F.col("cms_est") >= F.col("thr"))
        .select(key_col, "cms_est", "exact_cnt", "thr")
    )


def ams_f2(
    df: DataFrame, group_cols: list[str], key_col: str, trials: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """AMS second-moment (F2 = Σ_key count²) estimator: per trial t, a
    ±1 sign per key (parity of md5_long with salt ``ams:t``); the trial
    statistic s_t = Σ_rows sign_t(key) and E[s_t²] = F2. Estimate =
    mean of s_t² over trials, emitted with the exact integer Σ s_t²
    so the gate pins the sketch state.

    F2 is the self-join size / skew measure used to pick join
    strategies; the sketch is one groupBy carrying trials rows per
    group (map-side combined ±1 sums), vs the exact path's per-key
    shuffle.

    ``weight_col`` feeds the trials from a PRE-COUNTED (group, key,
    weight) table: s_t = Σ_key sign_t(key)·weight, identical to the raw
    Σ_rows sign (the sign depends only on the key; integer sums
    commute), while the explode×trials runs over distinct keys instead
    of raw rows.
    """
    t_col = F.explode(F.array(*[F.lit(t) for t in range(trials)])).alias("t")
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w")
    keyed = df.select(*group_cols, F.col(key_col).cast("string").alias("k"), w).select(
        *group_cols, "k", "w", t_col
    )
    sign = (
        F.when(F.pmod(_h60(F.concat_ws(":", F.lit("ams"), F.col("t").cast("string"), F.col("k"))), F.lit(2)) == 0, 1)
        .otherwise(-1)
        .cast("long")
    )
    per_trial = (
        keyed.select(*group_cols, "t", (sign * F.col("w")).alias("sign"))
        .groupBy(*group_cols, "t")
        .agg(F.sum("sign").alias("s_t"))
    )
    return per_trial.groupBy(*group_cols).agg(
        F.sum(F.col("s_t") * F.col("s_t")).alias("sum_sq"),
        F.round((F.sum(F.col("s_t") * F.col("s_t")) / F.lit(float(trials))), 4).alias("f2_est"),
    )


def exact_f2(
    df: DataFrame, group_cols: list[str], key_col: str, weight_col: str | None = None
) -> DataFrame:
    """Exact F2 = Σ_key count² per group (the verification side).
    ``weight_col`` reads the per-key counts from a pre-aggregated
    (group, key, weight) table — one row per (group, key) — skipping
    the per-key shuffle."""
    if weight_col is not None:
        return df.groupBy(*group_cols).agg(
            F.sum(F.col(weight_col).cast("long") * F.col(weight_col).cast("long")).alias("f2_exact")
        )
    return (
        df.groupBy(*group_cols, F.col(key_col).cast("string").alias("k"))
        .agg(F.count("*").alias("cnt"))
        .groupBy(*group_cols)
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("f2_exact"))
    )


def quantile_sample(
    df: DataFrame, group_cols: list[str], value_col: str, id_col: str, rate_den: int = 4
) -> DataFrame:
    """F35 state: a deterministic coordinated sample — keep the rows whose
    md5_long('qs:' + id) ≡ 0 (mod rate_den), i.e. a 1/rate_den Bernoulli
    draw decided by the row's CONTENT, not a per-partition RNG stream
    (§4 sampling rule: membership survives repartitioning, joins, and
    re-runs bit-for-bit).

    This is the mergeable quantile summary: the sample of a union IS the
    union of the samples (the filter is row-local), so per-day / per-
    partition sketches concatenate with no compaction logic, and the
    expected state is n/rate_den rows per group however the 100 TB is
    split. Classical sample-quantile bounds apply: rank error is
    O(sqrt(rate_den / n)) with the usual concentration constants.
    """
    keep = F.pmod(_h60(F.concat(F.lit("qs:"), F.col(id_col).cast("string"))), F.lit(rate_den)) == 0
    return df.where(keep).select(*group_cols, F.col(value_col).alias("v"), F.col(id_col).alias("_id"))


def sampled_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    rate_den: int = 4,
) -> DataFrame:
    """F35 estimate: exact linear-interpolation quantiles computed OVER the
    coordinated sample — pos = q·(n−1), v = v_lo + (pos−lo)·(v_hi−v_lo),
    ties in v broken by id so the ranked order is total and the DuckDB
    oracle replays the estimator value-for-value (each step is a single
    IEEE double op on identical inputs).

    The sort is per-group over SAMPLE rows only (n/rate_den), never the
    raw data — the whole point at 100 TB; the q-targets join is a
    broadcast of groups × len(qs) rows.
    """
    from pyspark.sql import Window

    s = quantile_sample(df, group_cols, value_col, id_col, rate_den)
    w = Window.partitionBy(*group_cols).orderBy("v", "_id")
    ranked = s.select(
        *group_cols, "v", F.row_number().over(w).alias("rn")
    )
    counts = ranked.groupBy(*group_cols).agg(F.max("rn").alias("n_sample"))
    targets = None
    for q in qs:
        t = counts.select(
            *group_cols,
            "n_sample",
            F.lit(q).alias("q"),
            # lo/hi are 1-based row numbers: pos = q·(n−1) ∈ [0, n−1]
            (F.floor(F.lit(q) * (F.col("n_sample") - 1)) + 1).cast("long").alias("lo"),
            (F.ceil(F.lit(q) * (F.col("n_sample") - 1)) + 1).cast("long").alias("hi"),
        )
        targets = t if targets is None else targets.unionByName(t)
    lo_v = ranked.select(*group_cols, F.col("rn").alias("lo"), F.col("v").alias("v_lo"))
    hi_v = ranked.select(*group_cols, F.col("rn").alias("hi"), F.col("v").alias("v_hi"))
    # kept op-for-op identical to the oracle's `q * (n-1) - (lo-1)`:
    # every step is one IEEE double operation on identical inputs
    frac = F.col("q") * (F.col("n_sample") - 1).cast("double") - (F.col("lo") - 1).cast("double")
    return (
        F.broadcast(targets)
        .join(lo_v, [*group_cols, "lo"])
        .join(hi_v, [*group_cols, "hi"])
        .select(
            *group_cols,
            "q",
            F.col("n_sample"),
            F.round(F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo")), 6).alias("q_est"),
        )
    )
