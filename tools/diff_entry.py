"""Diff one __spark_entry__ query against its DuckDB oracle at a given sf dir.

Usage: python tools/diff_entry.py <entry_name> [sf_dir]
Prints rows present on only one side (after string-normalizing values).
"""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    q = E.queries()[name]
    sdf = q(spark, sf_dir).toPandas()
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(norm(r[c]) for c in cols) for _, r in sdf.iterrows())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    osql = E.oracle_sql()[name]
    odf = con.execute(osql).fetchdf()
    ocols = sorted(odf.columns)
    oracle_rows = sorted(tuple(norm(r[c]) for c in ocols) for _, r in odf.iterrows())

    print("spark cols:", cols, "oracle cols:", ocols)
    print("spark n:", len(spark_rows), "oracle n:", len(oracle_rows))
    sset, oset = set(spark_rows), set(oracle_rows)
    only_s = sorted(sset - oset)[:20]
    only_o = sorted(oset - sset)[:20]
    print("== only in spark ==")
    for r in only_s:
        print(r)
    print("== only in oracle ==")
    for r in only_o:
        print(r)
    if not only_s and not only_o:
        print("MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
