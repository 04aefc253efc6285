"""Invariant + reference-recompute test for wave 24: propensity-score
stratified ATE composite.
"""

from __future__ import annotations

import math

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _fit_logistic(y, x, rounds=4):
    p = y.mean()
    b0, b1 = math.log(p / (1 - p)), 0.0
    for _ in range(rounds):
        eta = b0 + b1 * x
        mu = 1 / (1 + np.exp(-eta))
        w = mu * (1 - mu)
        z = eta + (y - mu) / w
        sw, swx = w.sum(), (w * x).sum()
        swxx, swz, swxz = (w * x * x).sum(), (w * z).sum(), (w * x * z).sum()
        det = sw * swxx - swx * swx
        b0, b1 = (swxx * swz - swx * swxz) / det, (sw * swxz - swx * swz) / det
    return b0, b1


def test_propensity_ate_matches_numpy(spark):
    out = (
        REGISTRY["propensity_stratified_ate"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("propensity_quintile")
    )
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .toPandas()
    )
    spend = orders.assign(p=orders.o_totalprice.round(2)).groupby("o_custkey").p.sum()
    t = (cust.c_mktsegment == "BUILDING").to_numpy(dtype=np.float64)
    x = cust.c_acctbal.to_numpy(dtype=np.float64) / 10000
    y = cust.c_custkey.map(spend).fillna(0).to_numpy(dtype=np.float64)
    b0, b1 = _fit_logistic(t, x)
    e = 1 / (1 + np.exp(-(b0 + b1 * x)))
    order = np.lexsort((cust.c_custkey.to_numpy(), e))
    n = len(order)
    base, extra = divmod(n, 5)
    sizes = [base + 1] * extra + [base] * (5 - extra)
    pos = 0
    num = den = 0.0
    for q, sz in enumerate(sizes, start=1):
        idx = order[pos : pos + sz]
        pos += sz
        ti, yi = t[idx], y[idx]
        n_t = int(ti.sum())
        assert out.loc[q, "n_customers"] == sz
        assert out.loc[q, "n_treated"] == n_t
        assert out.loc[q, "n_control"] == sz - n_t
        if n_t > 0 and n_t < sz:
            diff = yi[ti == 1].mean() - yi[ti == 0].mean()
            assert abs(out.loc[q, "stratum_diff"] - diff) < 0.5, q
            num += sz * diff
            den += sz
    ate = num / den
    assert abs(out["stratified_ate"].iloc[0] - ate) < 0.5
    # pooled column constant across rows
    assert out["stratified_ate"].nunique() == 1
    # counts conserve the population
    assert out["n_customers"].sum() == n


def test_kde_matches_numpy(spark):
    out = (
        REGISTRY["gaussian_kde_grid"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("grid_index")
    )
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_totalprice")
        .toPandas()
    )
    x = o.o_totalprice.to_numpy(dtype=np.float64)
    n = len(x)
    mu, sigma = x.mean(), x.std(ddof=1)
    h = 1.06 * sigma * n ** (-0.2)
    for gi in range(32):
        gx = mu + (gi - 16) * sigma / 4
        f = float(np.exp(-(((gx - x) / h) ** 2) / 2).sum()) / (
            n * h * math.sqrt(2 * math.pi)
        )
        assert abs(out.loc[gi, "density"] - f) < 1e-9, gi
        assert abs(out.loc[gi, "x"] - gx) < 0.5
    # density integrates to ~1 over the grid span (trapezoid, sigma/4 step)
    approx_mass = float(out.density.sum()) * sigma / 4
    assert 0.8 < approx_mass < 1.1
    assert (out.density >= 0).all()
    # unimodal-ish synthetic prices: peak near the center of the grid
    assert 4 <= out.density.idxmax() <= 28


def test_runs_test_matches_pure_python(spark):
    row = REGISTRY["runs_test_monthly"].fn(spark, SF_SMOKE).collect()[0]
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .toPandas()
    )
    o["idx"] = o.o_orderdate.map(lambda d: d.year * 12 + d.month)
    m = (
        o.groupby("idx")
        .o_totalprice.apply(lambda s: float(sum(round(v, 2) for v in s)))
        .sort_index()
    )
    vals = list(m.items())  # (idx, rev) sorted by month
    by_rev = sorted(vals, key=lambda kv: (kv[1], kv[0]))
    n = len(by_rev)
    med = by_rev[(n + 1) // 2 - 1][1]
    signs = [1 if rev > med else 0 for _, rev in vals]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), n - sum(signs)
    e = 1 + 2.0 * n1 * n2 / n
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n**2 * (n - 1))
    z = (runs - e) / math.sqrt(var)
    assert row.n_months == n
    assert row.n_above == n1 and row.n_below == n2
    assert row.n_runs == runs
    assert abs(row.expected_runs - e) < 1e-4
    assert abs(row.z_score - z) < 1e-6
    p_exact = 2 * 0.5 * math.erfc(abs(z) / math.sqrt(2))
    assert abs(row.p_value - p_exact) < 2e-7  # A&S tail error bound
    assert 0 <= row.p_value <= 1


def test_jackknife_matches_pure_python(spark):
    row = REGISTRY["jackknife_ratio_variance"].fn(spark, SF_SMOKE).collect()[0]
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .toPandas()
    )
    cust = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .toPandas()
    )
    nat = (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .select("n_nationkey", "n_name")
        .toPandas()
    )
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    df["p"] = df.o_totalprice.round(2)
    g = df.groupby("n_name").p.agg(["sum", "count"])
    S, N, K = g["sum"].sum(), int(g["count"].sum()), len(g)
    thetas = [(S - s) / (N - n) for s, n in zip(g["sum"], g["count"])]
    tbar = sum(thetas) / K
    jk_var = (K - 1) / K * sum((t - tbar) ** 2 for t in thetas)
    se = math.sqrt(jk_var)
    assert row.n_groups == K
    assert row.n_orders == N
    assert abs(row.ratio_estimate - S / N) < 1e-3
    assert abs(row.jackknife_se - se) < 1e-3
    assert abs(row.ci_lo - (S / N - 1.96 * se)) < 1e-2
    assert abs(row.ci_hi - (S / N + 1.96 * se)) < 1e-2
    # the CI brackets the point estimate and SE is positive
    assert row.ci_lo < row.ratio_estimate < row.ci_hi
    assert row.jackknife_se > 0
