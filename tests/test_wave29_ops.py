"""Independent reference-recompute tests for wave 29 (round 8):
ADF, CCF, Newey-West, Hurst R/S, and LAD regression — recomputed in
numpy/pure Python at sf0.001 from the same parquet."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _monthly(spark) -> pd.DataFrame:
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    d = pd.to_datetime(o.o_orderdate)
    o["t"] = d.dt.year * 12 + d.dt.month
    g = o.groupby("t").agg(
        rev=("o_totalprice", lambda v: float(np.round(v, 2).sum())),
        cnt=("o_totalprice", "size"),
    )
    return g.sort_index()


def test_adf_matches_numpy(spark):
    m = _monthly(spark)
    x = m.rev.to_numpy()
    z = x[:-1]
    y = np.diff(x)
    n = len(z)
    szz_c = (z * z).sum() - z.sum() ** 2 / n
    szy_c = (z * y).sum() - z.sum() * y.sum() / n
    syy_c = (y * y).sum() - y.sum() ** 2 / n
    beta = szy_c / szz_c
    rss = syy_c - beta * szy_c
    t = beta / math.sqrt((rss / (n - 2)) / szz_c)
    row = REGISTRY["adf_unit_root_lite"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_obs == n
    assert math.isclose(row.beta, beta, rel_tol=1e-5, abs_tol=1e-7)
    assert math.isclose(row.t_stat, t, rel_tol=1e-3, abs_tol=1e-3)
    assert row.stationary_5pct == int(t < -2.89)


def test_ccf_matches_numpy(spark):
    m = _monthly(spark)
    got = {
        r.lag_months: r
        for r in REGISTRY["ccf_lead_lag"].fn(spark, SF_SMOKE).collect()
    }
    ts = m.index.to_numpy()
    rev = dict(zip(ts, m.rev))
    cnt = dict(zip(ts, m.cnt))
    for k in range(-6, 7):
        pairs = [(rev[t + k], cnt[t]) for t in ts if t + k in rev]
        xs = np.array([p[0] for p in pairs])
        ys = np.array([p[1] for p in pairs], dtype=float)
        if len(pairs) <= 1 or xs.std() == 0 or ys.std() == 0:
            assert k not in got
            continue
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert k in got, k
        assert got[k].n_pairs == len(pairs)
        assert math.isclose(got[k].ccf, want, rel_tol=1e-4, abs_tol=1e-5), k


def test_newey_west_matches_numpy(spark):
    m = _monthly(spark)
    z = m.index.to_numpy(dtype=float)
    y = m.rev.to_numpy()
    n = len(z)
    zc = z - z.mean()
    b = (zc * y).sum() / (zc * zc).sum()
    a = y.mean() - b * z.mean()
    e = y - a - b * z
    u = zc * e
    szz_c = (zc * zc).sum()
    ols_se = math.sqrt(
        (((y - y.mean()) ** 2).sum() - b * (zc * y).sum()) / (n - 2) / szz_c
    )
    L = 3
    s = (u * u).sum()
    for lag in range(1, L + 1):
        s += 2 * (1 - lag / (L + 1)) * (u[lag:] * u[:-lag]).sum()
    nw_se = math.sqrt(s) / szz_c
    row = REGISTRY["newey_west_se"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == n
    assert math.isclose(row.slope, b, rel_tol=1e-5, abs_tol=1e-5)
    assert math.isclose(row.ols_se, ols_se, rel_tol=1e-3)
    assert math.isclose(row.nw_se, nw_se, rel_tol=1e-3)
    assert math.isclose(row.nw_ols_ratio, nw_se / ols_se, rel_tol=1e-3)


def test_hurst_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    daily = (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby("o_orderdate")
        .x.sum()
        .sort_index()
        .to_numpy()
    )
    mean_rs = {}
    for s in (8, 16, 32):
        vals = []
        for b in range(len(daily) // s):
            blk = daily[b * s : (b + 1) * s]
            mu = blk.mean()
            zdev = np.cumsum(blk) - (np.arange(1, s + 1)) * mu
            r = zdev.max() - zdev.min()
            sd = math.sqrt((blk * blk).mean() - mu * mu)
            if sd > 0:
                vals.append(r / sd)
        if vals:
            mean_rs[s] = float(np.mean(vals))
    ls = np.log(np.array(sorted(mean_rs)))
    lr = np.log(np.array([mean_rs[s] for s in sorted(mean_rs)]))
    k = len(ls)
    hurst = (k * (ls * lr).sum() - ls.sum() * lr.sum()) / (
        k * (ls * ls).sum() - ls.sum() ** 2
    )
    row = REGISTRY["hurst_exponent_rs"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_days == len(daily)
    for s, col in ((8, "rs8"), (16, "rs16"), (32, "rs32")):
        assert math.isclose(getattr(row, col), mean_rs[s], rel_tol=1e-5), s
    assert math.isclose(row.hurst, hurst, rel_tol=1e-3, abs_tol=1e-3)
    # R/S analysis sanity: a revenue series is not wildly anti-persistent
    assert 0.0 < row.hurst < 1.2


def test_lad_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    y = np.round(li.l_extendedprice.to_numpy(dtype=np.float64), 2)
    b0, b1 = float(y.mean()), 0.0
    for _ in range(3):
        w = 1.0 / np.maximum(np.abs(y - b0 - b1 * x), 1.0)
        sw, swx = w.sum(), (w * x).sum()
        swxx, swy, swxy = (w * x * x).sum(), (w * y).sum(), (w * x * y).sum()
        det = sw * swxx - swx * swx
        b0, b1 = (swxx * swy - swx * swxy) / det, (sw * swxy - swx * swy) / det
    mar = float(np.abs(y - b0 - b1 * x).mean())
    row = REGISTRY["quantile_regression_lad"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(y)
    assert math.isclose(row.intercept, b0, rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(row.slope, b1, rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(row.mean_abs_resid, mar, rel_tol=1e-4)
    # sanity vs the plain L2 fit: at convergence LAD minimizes MAR, but
    # 3 IRLS rounds only approach it — require within 1% of OLS's MAR
    # (at sf0.001 the two differ by ~0.003%)
    X = np.column_stack([np.ones_like(x), x])
    ols = np.linalg.lstsq(X, y, rcond=None)[0]
    mar_ols = float(np.abs(y - ols[0] - ols[1] * x).mean())
    assert row.mean_abs_resid <= mar_ols * 1.01
