"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with the `noop` sink (full pipeline runs, nothing
collected to the driver) — measures engine throughput, not toPandas.

Each query runs $SPARK_GRAFT_REPEATS times (default 5), with passes
INTERLEAVED across the query list, and reports the per-query MEDIAN
plus [min, max] spread; the headline value is the sum of medians.
Run-to-run variance on a shared box is ±30% — a single sample is
noise, the median is the engine, and the spread makes "regressed vs
noisy" decidable from the artifact alone.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402

#: Headline set: one per operator family; keep stable across rounds so
#: BENCH_r{N}.json trends are comparable. Names absent from the registry
#: are skipped (lets this file lead implementation).
HEADLINE = [
    "monthly_series",
    "q1_pricing",
    "revenue_by_nation",
    "top_orders",
    "latest_order_per_customer",
    "monthly_revenue_delta",
    "sessionize_events",
    "dedup_exact_documents",
    "text_stats",
    "minhash_bands",
    "sim_topk_bruteforce",
    "asof_policy_join",
    # round-1 additions (new operator families; additive so earlier
    # entries stay comparable across rounds)
    "cube_revenue",
    "salted_join_segments",
    "doc_fingerprint_rolling",
    "token_counts_bpe",
    "embedding_near_dup",
    "sim_topk_ivf",
    "stream_tumbling_counts",
    "shipping_priority",
    "local_supplier_volume",
    # round-1 late additions
    "events_type_profile",
    "winnow_shared_pairs",
    "order_priority_late_ship",
    "nation_volume_shipping",
    "small_qty_order_revenue",
    "large_order_customers",
    # round-1 final additions
    "min_cost_supplier",
    "sole_late_supplier",
    "disjunctive_promo_revenue",
    "chunk_documents",
    "pack_token_budget",
    "near_dup_components",
    # TPC-H sweep completion (q6/q8/q10 shapes; full 22-family coverage)
    "forecast_revenue_change",
    "nation_market_share",
    "returned_item_customers",
    # round-3 additions: e2e dedup chain, SQL-string surface, real
    # media header decode
    "dedup_pipeline_end2end",
    "sql_revenue_by_nation",
    "multimodal_features",
    # round-3 late additions
    "winnow_robust_census",
    "stratified_sample_events",
    "value_histogram_events",
    "stream_join_funnel_outer",
    "asof_nearest_event",
    "repeated_ngrams",
    "corpus_curation_funnel",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all()
    names = [n for n in HEADLINE if n in registry] or sorted(registry)
    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so per-query timings measure
    # steady-state execution, not session startup.
    registry[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # INTERLEAVED repeats: run the whole query list once per pass
    # instead of back-to-back samples per query, so a box-noise burst
    # (GC, another tenant) lands on different queries in different
    # passes rather than poisoning all samples of one query — the
    # failure mode that made r02 look like per-query regressions.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "5")))
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(repeats):
        for name in names:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    timings = {name: round(statistics.median(s), 3) for name, s in samples.items()}
    spread = {name: [round(min(s), 3), round(max(s), 3)] for name, s in samples.items()}
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "repeats": repeats,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
