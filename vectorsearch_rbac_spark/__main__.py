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


if __name__ == "__main__":
    raise SystemExit(main())
