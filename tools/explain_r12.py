"""Capture `.explain("formatted")` snapshots for the round-11
optimization deliverable: plans/r12/<query>_<tag>.txt.

Unlike tools/plan_snapshot.py (normalized, diff-oriented), this dumps
the RAW formatted plan the judge checks optimization claims against
(Exchange count, join strategy, PushedFilters/ReadSchema, codegen
spans, Python-eval nodes).

Usage: python tools/explain_r12.py <before|after> <query> [query ...]
       SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1 — the
       bench SF, so AQE/broadcast thresholds see bench-shaped sizes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r12")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    registry = load_all()
    spark = get_spark("explain-r12")
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
