"""Per-layout storage report (reference basic_benchmark/space_calculate.py).

Writes every physical layout / storage tier at the given sf dir and prints
one JSON object: {layout: {logical_mb, physical_mb, files, component}}.

    python tools/space_report.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_rbac_spark.sources import get_spark
from vectorsearch_rbac_spark.sources.space import space_report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="space_report_")
    spark = get_spark("space-report")
    rep = space_report(spark, sf_dir, out_dir)
    rep["_meta"] = {"sf_dir": sf_dir, "out_dir": out_dir}
    print(json.dumps(rep, sort_keys=True))


if __name__ == "__main__":
    main()
