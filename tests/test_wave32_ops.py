"""Independent reference-recompute tests for wave 32 (round 8):
Theta forecast, Haar energy, binary-segmentation changepoint, Cohen's
kappa, partial correlation, VIF — recomputed in numpy/pure Python at
sf0.001 from the same parquet.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _monthly(spark) -> np.ndarray:
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    d = pd.to_datetime(o.o_orderdate)
    o["y"], o["mo"] = d.dt.year, d.dt.month
    g = (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby(["y", "mo"])
        .x.sum()
        .reset_index()
        .sort_values(["y", "mo"])
    )
    return g.x.to_numpy(dtype=np.float64), (g.y * 100 + g.mo).to_numpy()


def test_theta_matches_numpy(spark):
    xs, _ = _monthly(spark)
    n = len(xs)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = ((t * xs).sum() - t.sum() * xs.sum() / n) / (
        (t * t).sum() - t.sum() ** 2 / n
    )
    a = (xs.sum() - b * t.sum()) / n
    z = 2 * xs - (a + b * t)
    al = 0.5
    level = z[0]
    for v in z[1:]:
        level = al * v + (1 - al) * level
    trend1 = a + b * (n + 1)
    row = REGISTRY["theta_method_forecast"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == n
    assert math.isclose(row.ses_theta_level, level, rel_tol=1e-6, abs_tol=0.02)
    assert math.isclose(row.trend_forecast, trend1, rel_tol=1e-6, abs_tol=0.02)
    assert math.isclose(
        row.theta_forecast, (level + trend1) / 2, rel_tol=1e-6, abs_tol=0.02
    )


def test_haar_matches_numpy(spark):
    xs, _ = _monthly(spark)
    xs = xs[:64] / 1e6
    n = len(xs)
    rows = {
        r.scale_months_log2: r
        for r in REGISTRY["haar_energy_monthly"].fn(spark, SF_SMOKE).collect()
    }
    total = 0.0
    want = {}
    for level in range(1, 7):
        w = 1 << level
        h = w >> 1
        energy, n_coeffs = 0.0, 0
        for blk in range(0, (n + w - 1) // w):
            seg = xs[blk * w : (blk + 1) * w]
            left = seg[:h]
            right = seg[h:]
            if len(left) == 0 and len(right) == 0:
                continue
            lm = left.sum() / h if len(left) else None
            rm = right.sum() / h if len(right) else None
            n_coeffs += 1
            if lm is None or rm is None:
                continue  # engines emit NULL-mean blocks as NULL energy
            energy += ((lm - rm) / 2) ** 2 * (2 ** level)
        want[level] = (n_coeffs, energy)
        total += energy
    for level in range(1, 7):
        if level not in rows:
            continue
        n_coeffs, energy = want[level]
        assert rows[level].n_coeffs == n_coeffs, level
        assert math.isclose(
            rows[level].energy_msq, energy, rel_tol=1e-5, abs_tol=1e-3
        ), level
        assert math.isclose(
            rows[level].energy_share, energy / total, rel_tol=1e-4, abs_tol=1e-5
        ), level
    # shares partition the total energy
    assert math.isclose(
        sum(r.energy_share for r in rows.values()), 1.0, abs_tol=1e-4
    )


def test_binseg_matches_numpy(spark):
    xs, months = _monthly(spark)
    n = len(xs)
    s = xs.sum()
    cx = np.cumsum(xs)
    best = None
    for t in range(1, n):
        g = cx[t - 1] ** 2 / t + (s - cx[t - 1]) ** 2 / (n - t) - s * s / n
        if best is None or g > best[0] + 1e-12:
            best = (g, t)
    g, t = best
    sst = ((xs - s / n) ** 2).sum()
    row = REGISTRY["binseg_changepoint_monthly"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == n
    assert row.split_after_t == t
    assert row.split_after_month == months[t - 1]
    assert math.isclose(row.mean_before, cx[t - 1] / t, rel_tol=1e-6, abs_tol=0.02)
    assert math.isclose(
        row.mean_after, (s - cx[t - 1]) / (n - t), rel_tol=1e-6, abs_tol=0.02
    )
    assert math.isclose(row.var_reduction, g / sst, rel_tol=1e-4, abs_tol=1e-5)
    assert 0.0 <= row.var_reduction <= 1.0


def test_kappa_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    ra = (docs.text.str.len() >= 300).to_numpy()
    rb = (
        docs.text.str.strip().str.lower().str.split(r"\s+").str.len() >= 60
    ).to_numpy()
    n = len(docs)
    a = int((ra & rb).sum())
    b = int((ra & ~rb).sum())
    c = int((~ra & rb).sum())
    d = int((~ra & ~rb).sum())
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    row = REGISTRY["cohens_kappa_rules"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_docs == n and row.n_both == a and row.n_neither == d
    assert math.isclose(row.observed_agreement, po, rel_tol=1e-6)
    assert math.isclose(row.chance_agreement, pe, rel_tol=1e-6)
    if pe < 1:
        assert math.isclose(row.kappa, (po - pe) / (1 - pe), rel_tol=1e-4)
        assert -1.0 - 1e-9 <= row.kappa <= 1.0 + 1e-9


def _xyz(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    y = np.round(li.l_extendedprice.to_numpy(dtype=np.float64), 2) / 10000
    z = np.round(li.l_discount.to_numpy(dtype=np.float64), 2)
    return x, y, z


def test_partial_corr_matches_numpy(spark):
    x, y, z = _xyz(spark)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    want = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    row = REGISTRY["partial_correlation_lineitem"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(x)
    assert math.isclose(row.r_qty_price, rxy, rel_tol=1e-5, abs_tol=1e-6)
    assert math.isclose(row.r_qty_discount, rxz, rel_tol=1e-4, abs_tol=1e-6)
    assert math.isclose(row.r_price_discount, ryz, rel_tol=1e-4, abs_tol=1e-6)
    assert math.isclose(row.partial_r_qty_price, want, rel_tol=1e-4, abs_tol=1e-6)


def test_vif_matches_numpy(spark):
    x, y, z = _xyz(spark)
    r = np.corrcoef(np.vstack([x, y, z]))
    det = np.linalg.det(r)
    inv = np.linalg.inv(r)
    row = REGISTRY["vif_lineitem_regressors"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(x)
    assert math.isclose(row.corr_det, det, rel_tol=1e-4, abs_tol=1e-6)
    assert math.isclose(row.vif_quantity, inv[0, 0], rel_tol=1e-3)
    assert math.isclose(row.vif_price, inv[1, 1], rel_tol=1e-3)
    assert math.isclose(row.vif_discount, inv[2, 2], rel_tol=1e-3)
    # VIF >= 1 always
    assert min(row.vif_quantity, row.vif_price, row.vif_discount) >= 1.0 - 1e-6
