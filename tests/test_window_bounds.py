"""Census-bound gate for partition-less windows (VERDICT r07 item 5,
made COMPLETE + default in round 9 per VERDICT r08 item 4).

Every global (no partitionBy) Window in the registry runs over a
bounded CENSUS relation — value levels, calendar cells, the rank
device's bucket-offset census — never over row-scale data. This test
measures the rows actually flowing into each partition-less WindowExec
(tools/window_audit.py, SQL metrics store) and pins a declared ceiling
per query at sf0.01, so a change that silently grows a census back to
row scale fails loudly instead of shipping.

Coverage is exhaustive and UN-GATED: BOUNDS lists every registry query
whose execution carries a partition-less window spec — found by
`python tools/window_audit.py --scan` (plan-only) UNION the
construction-time windows the thunk audit catches (eager
localCheckpoint subrelations whose windows run while the query is
being BUILT; the plan-only scan can't see those). Re-run the scan when
adding queries; test_scan_has_no_unbounded_newcomers cross-checks a
pinned snapshot so a new global-window query without a declared bound
fails the suite. The audit snapshots the metrics store BEFORE query
construction (window_input_rows_thunk), so construction-time windows
are measured too. PLANS.md ("Round 8: global-window census bounds")
documents the bound argument per query.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.queries import load_all
from tools.window_audit import window_input_rows_thunk

SF = "/root/testdata/sf0.01"

#: query -> declared max rows into any partition-less WindowExec at
#: sf0.01 (construction-time windows included). Ceilings are measured
#: values plus slack for data wobble — NOT targets; the point is the
#: ORDER OF MAGNITUDE (a census must stay a census).
BOUNDS: dict[str, int] = {
    # value censuses (domain-capped)
    "kruskal_wallis_event_values": 10_000,
    "ks_test_price_by_year": 8_000,
    "mannwhitney_u_event_values": 6_000,
    "hurst_exponent_rs": 10_000,     # day census × the 3 R/S subseries scales
    "corpus_datasheet": 600,
    "spearman_rank_correlation": 200,
    "newsvendor_quantile": 600,
    # calendar censuses (months / days / month-pairs)
    "theil_sen_monthly_trend": 4_000,
    "daily_zscore_anomalies": 3_000,
    "locf_forward_fill": 3_000,
    "nelson_aalen_hazard": 3_000,
    "rmst_survival": 3_000,
    "kaplan_meier_user_lifetime": 3_000,
    "seasonal_indices_monthly": 300,
    "mann_kendall_trend": 300,
    "rolling_avg_monthly": 150,
    "ewma_monthly_revenue": 150,
    "page_hinkley_revenue": 400,
    "sax_monthly_revenue": 200,
    "binseg_changepoint_monthly": 400,
    "theta_method_forecast": 400,
    "haar_energy_monthly": 400,
    "trend_seasonal_strength": 400,
    "forecast_backtest_mape": 150,
    "monthly_revenue_delta": 150,
    "open_order_backlog_monthly": 150,
    "periodogram_monthly": 150,
    "rolling_ols_trend": 150,
    "runs_test_monthly": 150,
    "sql_named_window_rollup": 150,
    "sql_recursive_holt_smoothing": 150,
    "compaction_plan": 150,
    "yule_walker_ar2_forecast": 150,
    "cusum_changepoint": 100,
    # method-inherent (sorted-neighborhood sliding window; seed ranks)
    "snm_near_dup_pairs": 1_500,
    "ransac_line_fit": 500,
    # bucket-offset censuses of the rank / running-agg device — these
    # MUST stay two orders below row scale
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
    # group censuses (segments × priorities / bins / digits / grids)
    "source_mixture_report": 300,
    "segment_priority_chisq": 100,
    "isotonic_calibration_pava": 100,
    "shuffle_bucket_histogram": 100,
    "skew_salting_advisor": 100,
    "benford_digit_census": 50,
    "bh_fdr_segment_tests": 50,
    "bradley_terry_nations": 50,
    "friedman_nations_monthly": 50,
    "information_gain_ranking": 50,
    "kmv_set_operations": 50,
    "neyman_allocation": 50,
    "poisson_bootstrap_ci": 50,
    "psi_drift_price": 50,
    "woe_iv_price_bins": 50,
    "zipf_slope_fit": 50,
    "zipf_token_slope": 50,
}

#: pinned output of `python tools/window_audit.py --scan` (plan-only
#: global-window witnesses) — every name here must carry a declared
#: bound above. trend_seasonal_strength and weighted_median_price are
#: in BOUNDS but not here: their global windows run during CONSTRUCTION
#: (checkpointed subrelations) and only the thunk audit sees them.
SCAN_SNAPSHOT = frozenset({
    "abc_pareto_classes", "benford_digit_census", "bh_fdr_segment_tests",
    "binseg_changepoint_monthly", "bradley_terry_nations",
    "clustering_coefficient_census", "compaction_plan", "corpus_datasheet",
    "cusum_changepoint", "daily_zscore_anomalies",
    "decision_stump_totalprice", "equi_depth_histogram",
    "ewma_monthly_revenue", "exact_percentile_cutpoints",
    "forecast_backtest_mape", "friedman_nations_monthly",
    "gini_customer_spend", "haar_energy_monthly", "heaps_law_fit",
    "hurst_exponent_rs", "information_gain_ranking",
    "isotonic_calibration_pava", "kaplan_meier_user_lifetime",
    "kmv_set_operations", "kruskal_wallis_event_values",
    "ks_test_price_by_year", "locf_forward_fill", "lorenz_curve_deciles",
    "mann_kendall_trend", "mannwhitney_u_event_values",
    "monthly_revenue_delta", "nelson_aalen_hazard", "newsvendor_quantile",
    "neyman_allocation", "open_order_backlog_monthly",
    "order_percentile_ranks", "page_hinkley_revenue",
    "pareto_skyline_orders", "periodogram_monthly", "poisson_bootstrap_ci",
    "propensity_stratified_ate", "psi_drift_price",
    "quantile_normalize_doclen", "ransac_line_fit", "rfm_segmentation",
    "rmst_survival", "rolling_avg_monthly", "rolling_ols_trend",
    "rrf_hybrid_retrieval", "runs_test_monthly", "sax_monthly_revenue",
    "seasonal_indices_monthly", "segment_priority_chisq",
    "session_concurrency_profile", "shuffle_bucket_histogram",
    "skew_salting_advisor", "snm_near_dup_pairs", "source_mixture_report",
    "spearman_rank_correlation", "sql_named_window_rollup",
    "sql_recursive_holt_smoothing", "theil_sen_monthly_trend",
    "theta_method_forecast", "watermark_design_census",
    "woe_iv_price_bins", "yule_walker_ar2_forecast", "zipf_slope_fit",
    "zipf_token_slope", "zonemap_pruning_audit",
})


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_global_window_input_within_declared_bound(spark, name):
    registry = load_all()
    rows = window_input_rows_thunk(
        spark, lambda: registry[name].fn(spark, SF)
    )
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


def test_scan_has_no_unbounded_newcomers():
    """Every plan-scan-flagged query has a declared bound. When this
    fails for a new query, run `python tools/window_audit.py <name>` to
    measure it, add a reviewed ceiling to BOUNDS, document the bound
    argument in PLANS.md, and refresh SCAN_SNAPSHOT."""
    unbounded = SCAN_SNAPSHOT - BOUNDS.keys()
    assert not unbounded, (
        f"global-window queries without a declared bound: {sorted(unbounded)}"
    )
