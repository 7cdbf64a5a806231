"""Physical-layout maintenance (SURVEY §2 H5/H6): Z-order clustering and
small-file compaction — the two lakehouse table services a 100 TB
deployment runs continuously (Delta OPTIMIZE ZORDER / compaction; here as
plain-parquet equivalents since format jars are absent in this sandbox).

- Z-order: interleave the bits of two rank-normalized columns into one
  sort key; sorting files by it makes per-file min/max ranges TIGHT in
  BOTH dimensions, so predicate pushdown on either column skips most
  files (a single-column sort only helps that column). The bit math is
  pure integer arithmetic — exact-oracle checkable.
- Compaction: rewrite a partition's many small files into few big ones,
  content-identical — the small-files problem is the top operational
  cost of streaming ingestion into a lakehouse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 16


def zorder_value(a, b, bits: int = Z_BITS) -> F.Column:
    """Interleave the low ``bits`` of two non-negative integer columns into
    one Morton code (a's bit i → position 2i+1, b's → 2i). Pure integer
    shifts/masks — identical arithmetic in any engine."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(ca.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
            + (F.shiftright(cb.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        )
    return z


def rank_normalize(df: DataFrame, col: str, bits: int = Z_BITS) -> F.Column:
    """Map a column to dense integer ranks in [0, 2^bits): Z-order needs
    comparable integer coordinates; percent_rank × (2^bits − 1) keeps
    skew from collapsing the curve. One global sort of the (small) rank
    window — at scale use approx quantile bucketing instead."""
    w = Window.orderBy(F.col(col))
    return (F.percent_rank().over(w) * ((1 << bits) - 1)).cast("long")


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8, bits: int = Z_BITS
) -> None:
    """Range-partition by the Morton code into ``n_files`` files: each file
    covers a compact Z-curve segment — tight min/max on BOTH columns."""
    z = df.withColumn("_za", rank_normalize(df, col_a, bits)).withColumn(
        "_zb", rank_normalize(df, col_b, bits)
    )
    z = z.withColumn("_z", zorder_value("_za", "_zb", bits)).drop("_za", "_zb")
    z.repartitionByRange(n_files, "_z").sortWithinPartitions("_z").drop("_z").write.mode(
        "overwrite"
    ).parquet(path)


def file_skip_stats(spark, path: str, col: str, lo, hi) -> dict:
    """How many parquet files a [lo, hi] predicate on ``col`` can skip via
    footer min/max — the data-skipping payoff measurement."""
    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    total, skippable = 0, 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = min(_rg_stat(md, i, col, "min") for i in range(md.num_row_groups))
        fmax = max(_rg_stat(md, i, col, "max") for i in range(md.num_row_groups))
        total += 1
        if fmax < lo or fmin > hi:
            skippable += 1
    return {"files": total, "skippable": skippable}


def _rg_stat(md, i, col, which):
    rg = md.row_group(i)
    for j in range(rg.num_columns):
        c = rg.column(j)
        if c.path_in_schema == col:
            st = c.statistics
            return getattr(st, which)
    raise KeyError(col)


def compact_partition_dir(spark, path: str, target_files: int = 1) -> dict:
    """Rewrite a parquet dir's many small files into ``target_files``
    big ones, content-identical (the streaming-ingestion small-files
    service). Returns before/after file counts."""
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {"files_before": len(before), "files_after": len(after)}


def write_sharded(
    df: DataFrame, path: str, n_shards: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """H10: training-set DELIVERY — write the corpus partitioned into
    deterministic shards (shard = md5(id) mod S, the E40 assignment) and
    return the manifest a training loader consumes: per shard, the file
    list is on disk under ``shard=K/`` and the manifest row carries row
    count, file count, and an order-independent membership checksum
    (bit_xor of md5(id)) so a loader can verify a shard before streaming
    it. Rewriting with a different S touches every file (it's a reshard);
    appending a NEW drop only adds files to existing shard dirs.

    Scale: one shuffle on the shard key; each shard dir is a self-
    contained unit a data-loader worker reads independently — the
    webdataset/tfrecord-shard layout on parquet.
    """
    from ..functions.vector import md5_long

    spark = df.sparkSession
    out = df.withColumn(
        "shard", F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards)).cast("int")
    )
    out.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.select(
            "shard",
            F.input_file_name().alias("_f"),
            md5_long(F.col(id_col).cast("string")).alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("_f").cast("long").alias("n_files"),
            F.expr("bit_xor(_h)").alias("membership_checksum"),
        )
    )
