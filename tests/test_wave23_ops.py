"""Invariant + reference-recompute tests for wave 23: logistic GLM via
IRLS, empirical-Bayes shrinkage, Zipf slope fit.
"""

from __future__ import annotations

import math
import re

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def _fit_logistic_numpy(y, x, rounds=4):
    p = y.mean()
    b0, b1 = math.log(p / (1 - p)), 0.0
    for _ in range(rounds):
        eta = b0 + b1 * x
        mu = 1 / (1 + np.exp(-eta))
        w = mu * (1 - mu)
        z = eta + (y - mu) / w
        sw, swx = w.sum(), (w * x).sum()
        swxx = (w * x * x).sum()
        swz, swxz = (w * z).sum(), (w * x * z).sum()
        det = sw * swxx - swx * swx
        b0 = (swxx * swz - swx * swxz) / det
        b1 = (sw * swxz - swx * swz) / det
    return b0, b1


def test_logistic_glm_matches_numpy(spark):
    row = REGISTRY["logistic_glm_irls"].fn(spark, SF_SMOKE).collect()[0]
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderstatus", "o_totalprice")
        .toPandas()
    )
    y = (o.o_orderstatus == "F").to_numpy(dtype=np.float64)
    x = o.o_totalprice.to_numpy(dtype=np.float64) / 100000
    b0, b1 = _fit_logistic_numpy(y, x)
    assert row.n_orders == len(o)
    assert abs(row.intercept - b0) < 1e-4
    assert abs(row.slope_per_100k - b1) < 1e-4
    assert abs(row.odds_ratio_per_100k - math.exp(b1)) < 1e-4
    mu = 1 / (1 + np.exp(-(b0 + b1 * x)))
    mll = float(-(y * np.log(mu) + (1 - y) * np.log(1 - mu)).mean())
    assert abs(row.mean_log_loss - mll) < 1e-4
    # log-loss no worse than the base-rate-only model
    p = y.mean()
    base_ll = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert row.mean_log_loss <= base_ll + 1e-9


def test_eb_shrinkage_matches_numpy(spark):
    out = (
        REGISTRY["eb_shrinkage_segments"]
        .fn(spark, SF_ORACLE)
        .toPandas()
        .set_index("segment")
    )
    cust = (
        spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .select("c_mktsegment", "c_acctbal")
        .toPandas()
    )
    g = cust.groupby("c_mktsegment").c_acctbal
    xbar, n, s2 = g.mean(), g.count(), g.var(ddof=1)
    gmean = xbar.mean()
    k = len(xbar)
    tau2 = max(
        float(((xbar**2).sum() - k * gmean**2) / (k - 1) - (s2 / n).mean()), 0.0
    )
    for seg in xbar.index:
        se2 = s2[seg] / n[seg]
        b = se2 / (tau2 + se2)
        eb = b * gmean + (1 - b) * xbar[seg]
        assert abs(out.loc[seg, "raw_mean"] - xbar[seg]) < 1e-2, seg
        assert abs(out.loc[seg, "shrink_factor"] - b) < 1e-5, seg
        assert abs(out.loc[seg, "eb_mean"] - eb) < 1e-2, seg
        # shrinkage pulls toward the grand mean, never past it
        lo, hi = sorted((xbar[seg], gmean))
        # 1e-3 covers the query's 4-decimal display rounding
        assert lo - 1e-3 <= out.loc[seg, "eb_mean"] <= hi + 1e-3, seg
    assert ((out.shrink_factor >= 0) & (out.shrink_factor <= 1)).all()


def test_zipf_slope_matches_numpy(spark):
    row = REGISTRY["zipf_slope_fit"].fn(spark, SF_SMOKE).collect()[0]
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .toPandas()
    )
    from collections import Counter

    census = Counter()
    for text in docs.text:
        if text is None or text.strip() == "":
            continue
        census.update(t for t in re.split(r"\s+", text.strip().lower()) if t)
    ranked = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    lx = np.log(np.arange(1, len(ranked) + 1))
    ly = np.log(np.array([f for _, f in ranked], dtype=np.float64))
    n = len(lx)
    slope = (n * (lx * ly).sum() - lx.sum() * ly.sum()) / (
        n * (lx * lx).sum() - lx.sum() ** 2
    )
    r2 = (n * (lx * ly).sum() - lx.sum() * ly.sum()) ** 2 / (
        (n * (lx * lx).sum() - lx.sum() ** 2) * (n * (ly * ly).sum() - ly.sum() ** 2)
    )
    assert row.n_ranks == n
    assert abs(row.zipf_slope - slope) < 1e-5
    assert abs(row.r_squared - r2) < 1e-5
    # a frequency-ranked curve always slopes down
    assert row.zipf_slope < 0
    assert 0 <= row.r_squared <= 1
