"""Run every queries() entry TWICE in one session and compare row-level
content hashes — the §4 determinism contract's direct test. The oracle
gate can't catch run-to-run instability on the Spark side (both runs
would be compared against the same SQL at different times); this can.

Usage: python tools/determinism_check.py [sf_dir]
Prints FLAKY <name> for any entry whose two runs differ; exits 1 if any.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from vectorsearch_rbac_spark.sources import get_spark


def _fingerprint(df):
    cols = sorted(df.columns)
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    r = df.select(F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h")).agg(
        F.count(F.lit(1)), F.expr("bit_xor(h)")
    ).first()
    return (r[0], r[1])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("determinism")
    spark.sparkContext.setLogLevel("ERROR")
    flaky = []
    for name, fn in entry.queries().items():
        try:
            a = _fingerprint(fn(spark, sf_dir))
            b = _fingerprint(fn(spark, sf_dir))
        except Exception as exc:
            print(f"ERROR {name}: {type(exc).__name__}")
            flaky.append(name)
            continue
        status = "ok" if a == b else "FLAKY"
        if a != b:
            flaky.append(name)
        print(f"{status} {name} rows={a[0]}")
    print(f"== {'ALL DETERMINISTIC' if not flaky else 'FLAKY: ' + ','.join(flaky)}")
    return 1 if flaky else 0


if __name__ == "__main__":
    raise SystemExit(main())
