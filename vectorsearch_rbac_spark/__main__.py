"""CLI: run any registered query against a scale-factor directory.

    python -m vectorsearch_rbac_spark list
    python -m vectorsearch_rbac_spark run cosine_topk [--sf-dir DIR] [--limit N] [--explain]
    python -m vectorsearch_rbac_spark oracle cosine_topk          # print the DuckDB oracle SQL

The run subcommand is the reference's per-script benchmark entrypoints
(basic_benchmark/test_*.py) folded into one: pick a strategy by name, get
rows + wall time; --explain prints the executed plan instead of rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _entry():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e

    return e


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="vectorsearch_rbac_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list available queries")
    runp = sub.add_parser("run", help="run a query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")
    orp = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orp.add_argument("query")
    pip = sub.add_parser(
        "pipeline",
        help="end-to-end training-data pipeline: curate -> shard -> pack -> manifest",
    )
    pip.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    pip.add_argument("--out", default="/tmp/vsr_pipeline_out")
    pip.add_argument("--n-shards", type=int, default=4)
    args = ap.parse_args(argv)

    e = _entry()
    qs = e.queries()
    if args.cmd == "list":
        oracles = e.oracle_sql()
        for name in qs:
            print(f"{name}  [{'exact-oracle' if name in oracles else 'rows-only'}]")
        return 0
    if args.cmd == "oracle":
        sql = e.oracle_sql().get(args.query)
        if sql is None:
            print(f"no oracle for {args.query!r} (rows-only query)", file=sys.stderr)
            return 1
        print(sql)
        return 0
    if args.cmd == "pipeline":
        return _pipeline(args)
    if args.query not in qs:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    from vectorsearch_rbac_spark.sources import get_spark

    spark = get_spark("cli")
    df = qs[args.query](spark, args.sf_dir)
    if args.explain:
        print(df._jdf.queryExecution().executedPlan().toString())
        return 0
    t0 = time.time()
    rows = df.limit(args.limit).collect()
    dt = time.time() - t0
    print(" | ".join(df.columns))
    for r in rows:
        print(" | ".join(str(v) for v in r))
    print(f"# {len(rows)} row(s) shown (limit {args.limit}) in {dt:.2f}s", file=sys.stderr)
    return 0


def _pipeline(args) -> int:
    """The full training-data flow in one command, each stage a module the
    test suite pins: quality gate + LSH near-dup clustering + canonical
    selection (curated corpus) → temperature mixture reweighting →
    deterministic sharding with a loader manifest → sequence-packing audit.
    Prints a per-stage summary; the shard dirs + manifest land in --out."""
    import time

    from pyspark.sql import functions as F

    from vectorsearch_rbac_spark.operators import curation
    from vectorsearch_rbac_spark.sources import get_spark, layouts, load_table

    spark = get_spark("pipeline")
    t0 = time.time()
    e = _entry()
    docs = load_table(spark, "documents", args.sf_dir)
    n0 = docs.count()

    curated_ids = e.q_curated_corpus(spark, args.sf_dir).select("doc_id")
    curated = docs.join(curated_ids, "doc_id")
    n1 = curated.count()
    print(f"[1/4] curate: {n0} -> {n1} docs (quality gate + near-dup clusters + canonical)")

    tempered = curation.temperature_mixture_sample(curated, tau=0.7)
    kept = curated.join(tempered.select("doc_id"), "doc_id")
    n2 = kept.count()
    print(f"[2/4] temper (tau=0.7): {n1} -> {n2} docs")

    manifest = layouts.write_sharded(kept, f"{args.out}/shards", n_shards=args.n_shards)
    rows = manifest.orderBy("shard").collect()
    for m in rows:
        print(f"[3/4] shard={m['shard']}: rows={m['n_rows']} files={m['n_files']} "
              f"checksum={m['membership_checksum']}")
    manifest.write.mode("overwrite").parquet(f"{args.out}/manifest")

    packs = curation.pack_sequences(kept, window_tokens=512, range_size=128)
    stats = packs.agg(
        F.count(F.lit(1)).alias("n_packs"), F.sum("pack_tokens").alias("tokens")
    ).first()
    print(f"[4/4] pack audit: {stats['n_packs']} windows of 512, {stats['tokens']} tokens total")
    print(f"done in {time.time() - t0:.1f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
