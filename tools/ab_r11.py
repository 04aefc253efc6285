"""Isolated-warm per-query timer for the round-11 optimization work.

Times each named query exactly the way bench.py does — build
`fn(spark, sf_dir)` plus the noop-sink action inside one perf_counter
window — but in a fresh session with only its own warm-up, so numbers
are not inflated by the definitive bench's 270-query session aging.
One warm pass (JIT, parquet footers), then `repeats` timed passes;
reports the median (and the samples). Persistent-RDD hygiene between
queries mirrors bench.py (localCheckpoints would otherwise accumulate
across queries and skew later ones).

Usage: python tools/ab_r11.py <query> [query ...]
       SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
       SPARK_GRAFT_REPEATS timed passes per query (default 3)
Prints one JSON line: {"medians": {...}, "samples": {...}, "sf_dir": ...}
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


def _cleanup(spark) -> None:
    jsc = spark.sparkContext._jsc.sc()
    for rdd_id in list(spark.sparkContext._jsc.getPersistentRDDs().keySet()):
        try:
            jsc.unpersistRDD(rdd_id, True)
        except Exception:
            pass
    spark.catalog.clearCache()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    registry = load_all()
    spark = get_spark("ab-r11")
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _cleanup(spark)
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            _cleanup(spark)
        samples[name] = runs
    print(json.dumps({
        "medians": {n: round(statistics.median(s), 3) for n, s in samples.items()},
        "samples": samples,
        "repeats": repeats,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
