"""Round-12 instrumentation sweep (VERDICT r11 items 5 and 9).

For every bench query at the given SF, measures — in ONE warm session —
  construct_s : wall seconds inside fn(spark, sf_dir) (plan construction
                plus any eager probe/loop jobs the fn runs itself)
  action_s    : wall seconds of the noop-sink action on the returned frame
  n_jobs      : Spark jobs submitted across both (via per-query job group)
The list runs twice; the SECOND pass is reported (steady state), matching
the bench's warm-then-measure discipline. Output: one JSON line per query
to stdout plus a sorted summary table to stderr.

Usage: python tools/jobcount_r12.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    registry = load_all()

    sys.path.insert(0, REPO)
    import bench as bench_mod

    names = [n for n in bench_mod.HEADLINE if n in registry]
    if only:
        names = [n for n in names if n in only] + [
            n for n in only if n not in set(names) and n in registry
        ]

    spark = get_spark("jobcount-r12")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    import gc

    def hygiene() -> None:
        try:
            jmap = sc._jsc.sc().getPersistentRDDs()
            it = jmap.iterator()
            while it.hasNext():
                it.next()._2().unpersist(True)
        except Exception:
            pass
        gc.collect()

    results: dict[str, dict] = {}
    for pass_no in (1, 2):
        for name in names:
            group = f"{name}#p{pass_no}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            try:
                df = registry[name].fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
            except Exception as e:  # noqa: BLE001
                print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            finally:
                sc.setJobGroup(None, None)
            jobs = tracker.getJobIdsForGroup(group)
            if pass_no == 2:
                results[name] = {
                    "query": name,
                    "construct_s": round(t1 - t0, 3),
                    "action_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "n_jobs": len(jobs),
                }
        hygiene()

    for name in names:
        if name in results:
            print(json.dumps(results[name]))

    rows = sorted(results.values(), key=lambda r: -r["total_s"])
    print(f"\n{'query':40s} {'total':>7s} {'constr':>7s} {'action':>7s} {'jobs':>5s}",
          file=sys.stderr)
    for r in rows:
        print(f"{r['query']:40s} {r['total_s']:7.3f} {r['construct_s']:7.3f} "
              f"{r['action_s']:7.3f} {r['n_jobs']:5d}", file=sys.stderr)
    tj = sum(r["n_jobs"] for r in rows)
    tt = sum(r["total_s"] for r in rows)
    print(f"\nTOTAL {len(rows)} queries, {tt:.1f}s, {tj} jobs", file=sys.stderr)


if __name__ == "__main__":
    main()
