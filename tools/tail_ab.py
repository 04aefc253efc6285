"""A/B: do SPREAD_ONLY pass-tail timings converge to isolated-warm in a
fresh session? (VERDICT r09 item 8 — "de-age the bench session".)

The definitive bench measures the SPREAD_ONLY heavy tail INSIDE a long
session that has already run ~270 queries x 5 passes; those in-pass
numbers inflate 10-20 % over isolated-warm even after synchronous
unpersist + GC (ROUND_NOTES r09: residual session aging no cleanup
reverses). This tool measures the SAME tail in a brand-new process
(fresh JVM, fresh SparkContext) with only its own warm-up, repeats
matching the bench. Compare its medians to the in-pass medians in
BENCH_SPREAD_r{N}.json: convergence means bench.py should run the tail
in a young session; non-convergence means the gap is not session age.

Usage: python tools/tail_ab.py [sf_dir]   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import SPREAD_ONLY  # the bench's own tail list

    registry = load_all()
    names = [n for n in SPREAD_ONLY if n in registry]
    spark = get_spark("tail-ab")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "5")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for name in names:  # warm pass (JIT, parquet footers)
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(repeats):
        for name in names:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    print(json.dumps({
        "fresh_session_tail_medians": {
            n: round(statistics.median(s), 3) for n, s in samples.items()
        },
        "repeats": repeats,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
