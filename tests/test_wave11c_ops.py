"""Invariant tests for the wave-11 batch-3/4 queries: rolling OLS,
CUPED, Wilson intervals, diff-in-diff A/A, power/sample sizing —
each checked against an independent numpy/closed-form recompute.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_rolling_ols_matches_polyfit(spark):
    rows = REGISTRY["rolling_ols_trend"].fn(spark, SF_SMOKE).collect()
    series = {r.month_index: r.revenue for r in rows}
    ts = sorted(series)
    for r in rows:
        frame_t = [t for t in ts if r.month_index - 5 <= t <= r.month_index]
        assert r.frame_n == len(frame_t)
        if r.frame_n >= 2 and len(set(frame_t)) > 1:
            x = np.array(frame_t, dtype=float)
            y = np.array([series[t] for t in frame_t])
            slope = np.polyfit(x, y, 1)[0]
            assert abs(r.trend_slope - slope) < 1e-6 * max(1.0, abs(slope)), r


def test_cuped_matches_numpy(spark):
    rows = REGISTRY["cuped_variance_reduction"].fn(spark, SF_SMOKE).collect()
    orders = (
        table(spark, SF_SMOKE, "orders")
        .join(
            table(spark, SF_SMOKE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_custkey", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    orders["pre"] = orders.o_orderdate.dt.year < 1998
    for r in rows:
        sub = orders[orders.c_mktsegment == r.segment]
        g = sub.groupby(["o_custkey", "pre"]).o_totalprice.sum().unstack(fill_value=0)
        x = g.get(True, 0)
        y = g.get(False, 0)
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        assert r.n_customers == len(g)
        if np.var(x) > 0 and np.var(y) > 0:
            theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
            rho2 = np.corrcoef(x, y)[0, 1] ** 2
            assert abs(r.theta - theta) < 1e-9 * max(1.0, abs(theta))
            assert abs(r.variance_reduction - rho2) < 1e-9
            assert 0.0 <= r.variance_reduction <= 1.0


def test_wilson_interval_properties(spark):
    rows = REGISTRY["wilson_proportion_intervals"].fn(spark, SF_ORACLE).collect()
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        # closed-form recompute
        z = 1.96
        p, n = r.p_hat, r.n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
        den = 1 + z * z / n
        assert abs(r.wilson_lo - (center - half) / den) < 1e-12
        assert abs(r.wilson_hi - (center + half) / den) < 1e-12


def test_did_aa_is_small(spark):
    """Null treatment (hash split) => the A/A DiD estimate must be tiny
    relative to the mean order value."""
    r = REGISTRY["diff_in_diff_estimator"].fn(spark, SF_ORACLE).collect()[0]
    mean_value = np.mean(
        [r.treated_pre, r.treated_post, r.control_pre, r.control_post]
    )
    assert abs(r.did_estimate) < 0.15 * mean_value
    assert r.n_orders == table(spark, SF_ORACLE, "orders").count()


def test_power_formula_recompute(spark):
    rows = REGISTRY["power_sample_size"].fn(spark, SF_ORACLE).collect()
    zsum_sq = (1.959963984540054 + 0.8416212335729143) ** 2
    for r in rows:
        mde = 0.02 * r.mean_value
        want = math.ceil(2 * r.sd_value**2 * zsum_sq / (mde * mde))
        assert abs(r.n_per_arm_2pct_mde - want) <= 1, r
        assert r.dispersion_index > 0
