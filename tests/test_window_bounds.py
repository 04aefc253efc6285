"""Census-bound gate for partition-less windows (VERDICT r07 item 5).

Every remaining global (no partitionBy) Window in the registry runs
over a bounded CENSUS relation — value levels, calendar cells, the
rank device's bucket-offset census — never over row-scale data. This
test measures the rows actually flowing into each partition-less
WindowExec (tools/window_audit.py, SQL metrics store) and pins a
declared ceiling per query at sf0.01, so a change that silently grows
a census back to row scale fails loudly instead of shipping.

Default run covers the queries whose census is load-bearing (largest
inputs / recently converted). Set SPARK_GRAFT_WINDOW_AUDIT_FULL=1 to
sweep every declared query. PLANS.md ("Round 8: global-window census
bounds") documents the bound argument per query.
"""

from __future__ import annotations

import os

import pytest

from ocean_data_pipeline_spark.queries import load_all
from tools.window_audit import window_input_rows

SF = "/root/testdata/sf0.01"

#: query -> declared max rows into any partition-less WindowExec at
#: sf0.01. Ceilings are measured values plus slack for data wobble —
#: NOT targets; the point is the ORDER OF MAGNITUDE (a census must
#: stay a census).
BOUNDS: dict[str, int] = {
    # value censuses (domain-capped)
    "kruskal_wallis_event_values": 10_000,
    "ks_test_price_by_year": 8_000,
    "mannwhitney_u_event_values": 6_000,
    "corpus_datasheet": 600,
    "spearman_rank_correlation": 200,
    # calendar censuses
    "theil_sen_monthly_trend": 4_000,
    "daily_zscore_anomalies": 3_000,
    "seasonal_indices_monthly": 300,
    "mann_kendall_trend": 300,
    "rolling_avg_monthly": 150,
    "ewma_monthly_revenue": 150,
    "page_hinkley_revenue": 400,
    "sax_monthly_revenue": 200,
    # wave 31: seed row_number over the 10 hash-selected rows (the
    # audit sees per-partition limit rows pre-final-limit)
    "ransac_line_fit": 500,
    # wave 32: month-census row_number / prefix sums
    "theta_method_forecast": 400,
    "haar_energy_monthly": 400,
    # wave 34: month census MA frames; daily-demand value census
    "trend_seasonal_strength": 400,
    "newsvendor_quantile": 600,
    "kaplan_meier_user_lifetime": 100,
    # method-inherent (sorted-neighborhood sliding window)
    "snm_near_dup_pairs": 1_500,
    # bucket-offset censuses of the rank / running-agg device — the
    # round-8 conversions; these MUST stay two orders below row scale
    "decision_stump_totalprice": 800,
    "equi_depth_histogram": 800,
    "exact_percentile_cutpoints": 800,
    "order_percentile_ranks": 800,
    "pareto_skyline_orders": 800,
    "rfm_segmentation": 600,
    "gini_customer_spend": 600,
    "lorenz_curve_deciles": 600,
    "abc_pareto_classes": 400,
    "clustering_coefficient_census": 300,
    "zonemap_pruning_audit": 200,
    "weighted_median_price": 800,
    "session_concurrency_profile": 100,
    "watermark_design_census": 100,
    "quantile_normalize_doclen": 100,
    "heaps_law_fit": 100,
    "rrf_hybrid_retrieval": 100,
    "propensity_stratified_ate": 100,
}

#: always-run subset: the conversions this gate exists to protect plus
#: the largest remaining censuses
CORE = [
    "zonemap_pruning_audit",
    "session_concurrency_profile",
    "decision_stump_totalprice",
    "watermark_design_census",
    "quantile_normalize_doclen",
    "rrf_hybrid_retrieval",
    "heaps_law_fit",
    "abc_pareto_classes",
    "clustering_coefficient_census",
    "propensity_stratified_ate",
    "weighted_median_price",
    "mannwhitney_u_event_values",
]

_FULL = os.environ.get("SPARK_GRAFT_WINDOW_AUDIT_FULL", "") in ("1", "true")
NAMES = sorted(BOUNDS) if _FULL else CORE


@pytest.mark.parametrize("name", NAMES)
def test_global_window_input_within_declared_bound(spark, name):
    registry = load_all()
    rows = window_input_rows(spark, registry[name].fn(spark, SF))
    mx = max(rows) if rows else 0
    assert mx <= BOUNDS[name], (
        f"{name}: {mx} rows flowed into a partition-less WindowExec at "
        f"sf0.01 (declared census bound {BOUNDS[name]}). Either a census "
        "relation regressed to row scale, or the bound needs a reviewed "
        "update in tests/test_window_bounds.py + PLANS.md."
    )


def test_bounds_name_registered():
    registry = load_all()
    missing = [n for n in BOUNDS if n not in registry]
    assert not missing, f"BOUNDS names not in registry: {missing}"
