"""CSV / JSON-lines ingest with explicit schemas (SURVEY.md §2 H3).

Parity: the reference loads external datasets through Python readers into
Postgres (``services/read_dataset_function.py``); the lakehouse-native form
is schema'd file ingest straight into DataFrames.

Explicit schemas are non-negotiable at scale: schema inference reads the
data twice and silently widens types between runs; a declared StructType
makes ingest one pass with stable types, and ``mode=FAILFAST`` surfaces
malformed rows instead of nulling them.

Vector columns travel as JSON arrays in text formats; ``parse_vector``
restores ``array<float>`` (``from_json`` — JVM-side, no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    return spark.read.schema(schema).options(mode=mode, **options).json(path)


def parse_vector(col, dtype=FloatType()) -> F.Column:
    """Decode a JSON-array string column into array<float> (vectors on the
    wire in csv/jsonl)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, ArrayType(dtype))


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC ingest (columnar, self-describing schema — Spark-native reader,
    vectorized + predicate-pushdown like parquet). No schema argument:
    ORC files carry their types; a mismatch fails the scan rather than
    silently widening."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink; ``partition_by`` gives the same directory-pruned layout the
    parquet writers use (nested types — array<float> vectors — round-trip
    natively, unlike csv/jsonl's JSON-string encoding)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_parquet_evolving(spark: SparkSession, path: str, **options) -> DataFrame:
    """Schema-evolution-tolerant parquet read (H5): ``mergeSchema`` unions
    the footers of every file, so drops written before a column existed
    read back with NULLs in that column instead of failing — the lakehouse
    contract for additive evolution (Delta/Iceberg do this through
    metadata; plain parquet pays one footer read per file, which is why
    it's opt-in here and NOT the default read path).
    """
    return spark.read.option("mergeSchema", "true").parquet(path, **options)
