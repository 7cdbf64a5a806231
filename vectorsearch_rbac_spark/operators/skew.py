"""Skew mitigation + join-pruning operators (SURVEY.md §3 scale toolbox).

A hash-shuffled join collapses when one key holds a disproportionate share
of the fact rows: every row of the hot key lands on one reducer. AQE's
skew-join splitting handles sort-merge joins at runtime; ``salted_join``
is the explicit, planner-independent form — REWRITE the join so no single
(key, salt) cell can be hot, at the cost of replicating the (small) build
side ``salt`` times.

``bloom_build``/``bloom_prune`` (F36) are the explicit form of Spark's
runtime bloom-filter join pruning (spark.sql.optimizer.runtime.bloomFilter,
InjectRuntimeFilter): hash the SMALL side's join keys into an m-bit filter,
then drop fact rows that cannot match BEFORE the shuffle — at 100 TB the
savings is (1 − selectivity) of the fact shuffle for a few KB broadcast.
Unlike the planner's (whose might_contain uses an engine-private hash),
this one hashes with the §4 md5_long contract, so the DuckDB oracle
replays every bit and even the false-positive count is deterministic.

Results are provably identical to the unfiltered join (exact-oracle
checked in ``__spark_entry__``): a Bloom filter has no false negatives,
and surviving false positives are removed by the real join that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 63 usable bits per packed BIGINT word: bit 63 is never set, so
# shiftleft(1, bit) can't overflow in either engine (DuckDB raises on
# 1<<63; Spark wraps silently — neither is a bit you want to debug).
_WORD_BITS = 63


def _h60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _bloom_bit(key: str, i: int, m_bits: int, hash_fn: str) -> F.Column:
    """Bit index of hash i for a key: md5 ('bf:i:'+x, the §4 cross-engine
    contract — the DuckDB oracle replays it) or xxhash64 (seeded by i;
    one codegen'd JVM hash per draw — the production hot path, the same
    family Spark's own InjectRuntimeFilter uses)."""
    if hash_fn == "md5":
        return F.pmod(_h60(F.concat(F.lit(f"bf:{i}:"), F.col(key).cast("string"))), F.lit(m_bits))
    return F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(m_bits))


def bloom_build(
    dim: DataFrame, key: str, m_bits: int = 4096, k_hashes: int = 4, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Build an m-bit Bloom filter over ``dim[key]`` as a DataFrame of
    (word_idx, word) packed-BIGINT rows — ceil(m/63) rows total, one
    map-side-combinable bit_or aggregate, mergeable across builds.

    ``hash_fn``: 'xxhash64' (default — native codegen hash; measured
    ~40× cheaper per probe row than the md5 contract hash) or 'md5'
    (the §4 cross-engine formula the oracle-checked entry uses; build
    and probe must agree).
    """
    bits = None
    for i in range(k_hashes):
        b = dim.select(_bloom_bit(key, i, m_bits, hash_fn).alias("b"))
        bits = b if bits is None else bits.unionByName(b)
    return (
        bits.select(
            F.expr(f"b DIV {_WORD_BITS}").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(b % {_WORD_BITS} AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_prune(
    fact: DataFrame, bloom: DataFrame, key: str, m_bits: int = 4096, k_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep only fact rows whose k filter bits are ALL set — the pre-shuffle
    prune. The filter words are collected (ceil(m/63) longs — KBs) and
    inlined as a literal array, so the check is pure whole-stage codegen on
    the fact scan: no join, no shuffle, exactly how the planner's runtime
    filter is pushed into the probe side. ``hash_fn`` must match the build.

    When to use (measured, tools/bloom_probe.py): ahead of a SHUFFLE join
    the prune removes (1−selectivity) of both the scan output and the
    shuffle; ahead of a BROADCAST join the join itself is already the
    cheapest filter, so a prune only pays if something expensive (a
    shuffle, a wide aggregation, an exchange reuse) sits between scan
    and join.
    """
    n_words = (m_bits + _WORD_BITS - 1) // _WORD_BITS
    words = [0] * n_words
    for r in bloom.collect():
        words[int(r["word_idx"])] = int(r["word"])
    # shiftright with a COLUMN shift count needs expr(); build the whole
    # predicate as one SQL expression over the literal word array so the
    # check stays inside whole-stage codegen on the fact scan.
    arr_sql = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    conds = []
    for i in range(k_hashes):
        if hash_fn == "md5":
            b = (
                f"pmod(CAST(conv(substring(md5(concat('bf:{i}:', CAST({key} AS STRING))), 1, 15),"
                f" 16, 10) AS BIGINT), {m_bits})"
            )
        else:
            b = f"pmod(xxhash64({i}, {key}), {m_bits})"
        conds.append(
            f"((shiftright(element_at({arr_sql}, CAST({b} DIV {_WORD_BITS} AS INT) + 1), "
            f"CAST({b} % {_WORD_BITS} AS INT)) & CAST(1 AS BIGINT)) = 1)"
        )
    return fact.where(F.expr(" AND ".join(conds)))


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
