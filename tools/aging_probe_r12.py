"""Round-12 probe: what ages between bench start and the graph family's
slot (VERDICT r11 item 3a)?

Reproduces the bench's in-pass conditions in ONE JVM: a warm pass over
the full headline list (no per-query hygiene — the r11 bench shape),
timing every query; then the probe block (the four queries whose
driver-run time is 1.3-2x their isolated-warm) is re-timed three ways:
  aged       : as measured inside the pass (state from ~260 queries)
  post-clean : immediately after a synchronous unpersist + double GC
  post-clean2: a second back-to-back run (steady clean state)
If post-clean recovers most of the aged-vs-isolated gap, the bench's
_hygiene cadence (once per PASS) is the aging source and should run
per query instead.

Also prints the persistent-RDD count and executor storage-memory used
at the probe slot, before and after cleanup, so the mechanism is named
rather than guessed.

Usage: python tools/aging_probe_r12.py [sf_dir]
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402

PROBE = [
    "link_prediction_capped",
    "copurchase_triangle_census",
    "clustering_coefficient_census",
    "kcore_copurchase",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry = load_all()
    import bench as bench_mod

    names = [n for n in bench_mod.HEADLINE if n in registry]
    spark = get_spark("aging-probe-r12")
    sc = spark.sparkContext

    def run(name: str) -> float:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def n_persistent() -> int:
        try:
            jmap = sc._jsc.sc().getPersistentRDDs()
            return jmap.size()
        except Exception:
            return -1

    def storage_used() -> int:
        try:
            mgr = sc._jsc.sc().env().blockManager().memoryStore()
            return int(mgr.currentUnrollMemory() + 0) or int(
                sc._jsc.sc().env().blockManager().memoryManager().storageMemoryUsed()
            )
        except Exception:
            try:
                return int(
                    sc._jsc.sc().env().blockManager().memoryManager().storageMemoryUsed()
                )
            except Exception:
                return -1

    def hygiene() -> None:
        try:
            jmap = sc._jsc.sc().getPersistentRDDs()
            it = jmap.iterator()
            while it.hasNext():
                it.next()._2().unpersist(True)
        except Exception as e:
            print(f"hygiene unavailable: {e}", file=sys.stderr)
        gc.collect()
        try:
            sc._jvm.System.gc()
        except Exception:
            pass

    # warm pass (bench does this via pass-1-of-5; one suffices for JIT +
    # footers at this granularity), NO per-query hygiene
    print("== warm pass (no per-query hygiene) ==", flush=True)
    for name in names:
        run(name)

    # timed aged pass, still no per-query hygiene — the r11 bench shape
    print("== timed aged pass ==", flush=True)
    aged: dict[str, float] = {}
    for name in names:
        aged[name] = run(name)
    print(f"persistent RDDs at end of pass: {n_persistent()}", flush=True)
    print(f"storage memory used: {storage_used()}", flush=True)

    for q in PROBE:
        print(f"AGED {q}: {aged[q]:.3f}s", flush=True)

    # clean, then re-probe back-to-back
    hygiene()
    print(f"persistent RDDs after hygiene: {n_persistent()}", flush=True)
    print(f"storage memory used after hygiene: {storage_used()}", flush=True)
    for q in PROBE:
        t = run(q)
        print(f"POST-CLEAN {q}: {t:.3f}s", flush=True)
    hygiene()
    for q in PROBE:
        t = run(q)
        print(f"POST-CLEAN2 {q}: {t:.3f}s", flush=True)

    # reference: per-query-hygiene pass over the probe block ONLY
    for q in PROBE:
        hygiene()
        t = run(q)
        print(f"PER-QUERY-HYGIENE {q}: {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
