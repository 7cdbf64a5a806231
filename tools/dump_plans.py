"""Dump .explain("formatted") for named bench queries to files.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt per query. Names resolve through the
same mapping bench.py uses (EXTRA overrides, then the queries() registry),
so a plan file corresponds exactly to what the bench times. With no names,
dumps every HEADLINE entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entry
from vectorsearch_rbac_spark.sources import get_spark


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:] or list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = entry.queries()
    for name in names:
        fn = bench.EXTRA.get(name) or qs.get(name)
        if fn is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            plan = f"error: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n{plan}")
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
