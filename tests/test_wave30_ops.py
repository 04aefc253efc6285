"""Independent reference-recompute tests for wave 30 (round 8):
modularity, Fisher exact (math.comb ground truth), McNemar, Huber
IRLS, SAX, Page-Hinkley, and closed-form 2x2 PCA — recomputed in
numpy/pure Python at sf0.001 from the same parquet.
"""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _monthly(spark) -> pd.DataFrame:
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    d = pd.to_datetime(o.o_orderdate)
    o["y"], o["mo"] = d.dt.year, d.dt.month
    g = (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby(["y", "mo"])
        .x.sum()
        .reset_index()
        .sort_values(["y", "mo"])
        .reset_index(drop=True)
    )
    return g


def _edges(spark) -> set[tuple[int, int]]:
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(grp.l_partkey)), 2):
            edges.add((a, b))
    return edges


def test_modularity_matches_python(spark):
    edges = _edges(spark)
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    brand = dict(zip(part.p_partkey, part.p_brand))
    m = len(edges)
    d_c: dict[str, int] = {}
    e_c: dict[str, int] = {}
    for a, b in edges:
        ba, bb = brand[a], brand[b]
        d_c[ba] = d_c.get(ba, 0) + 1
        d_c[bb] = d_c.get(bb, 0) + 1
        if ba == bb:
            e_c[ba] = e_c.get(ba, 0) + 1
    q = sum(
        e_c.get(c, 0) / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )
    row = REGISTRY["modularity_brand_partition"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_edges == m
    assert row.n_communities == len(d_c)
    assert row.n_within_edges == sum(e_c.values())
    assert math.isclose(row.modularity, q, rel_tol=1e-5, abs_tol=1e-6)


def test_fisher_exact_matches_comb(spark):
    g = _monthly(spark)
    mu = g.x.sum() / len(g)
    late = g.y >= 1996
    high = g.x > mu
    a = int((late & high).sum())
    b = int((late & ~high).sum())
    c = int((~late & high).sum())
    d = int((~late & ~high).sum())
    K, n1, N = a + b, a + c, a + b + c + d
    # exact hypergeometric right tail via integer combinatorics
    p = sum(
        math.comb(K, k) * math.comb(N - K, n1 - k) for k in range(a, min(K, n1) + 1)
    ) / math.comb(N, n1)
    row = REGISTRY["fisher_exact_monthly"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == N
    assert row.n_late_high == a
    assert math.isclose(row.p_right_tail, p, rel_tol=1e-6, abs_tol=1e-8)
    if b * c > 0:
        assert math.isclose(row.odds_ratio, a * d / (b * c), rel_tol=1e-6)
    # a p-value is a probability
    assert 0.0 <= row.p_right_tail <= 1.0 + 1e-12


def test_mcnemar_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    ra = docs.text.str.len() >= 300
    rb = docs.text.str.strip().str.lower().str.split(r"\s+").str.len() >= 60
    b = int((ra & ~rb).sum())
    c = int((~ra & rb).sum())
    row = REGISTRY["mcnemar_doc_rules"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_docs == len(docs)
    assert row.n_a_only == b
    assert row.n_b_only == c
    assert math.isclose(
        row.agree_rate, float((ra == rb).sum()) / len(docs), rel_tol=1e-6
    )
    if b + c > 0:
        stat = (abs(b - c) - 1) ** 2 / (b + c)
        assert math.isclose(row.mcnemar_chi2, stat, rel_tol=1e-6)
        # A&S 26.2.17 reproduces the chi2(1df) tail to ~1e-7
        from math import erfc, sqrt

        assert math.isclose(
            row.p_value, erfc(sqrt(stat / 2)), rel_tol=5e-4, abs_tol=1e-6
        )


def test_huber_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    y = np.round(li.l_extendedprice.to_numpy(dtype=np.float64), 2)
    b0, b1 = float(y.mean()), 0.0
    for _ in range(3):
        w = np.minimum(1.0, 20000.0 / np.maximum(np.abs(y - b0 - b1 * x), 1e-12))
        sw, swx = w.sum(), (w * x).sum()
        swxx, swy, swxy = (w * x * x).sum(), (w * y).sum(), (w * x * y).sum()
        det = sw * swxx - swx * swx
        b0, b1 = (swxx * swy - swx * swxy) / det, (sw * swxy - swx * swy) / det
    mar = float(np.abs(y - b0 - b1 * x).mean())
    row = REGISTRY["huber_regression_irls"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(y)
    assert math.isclose(row.intercept, b0, rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(row.slope, b1, rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(row.mean_abs_resid, mar, rel_tol=1e-4)
    # bounded influence: Huber's MAR sits at or below OLS's
    X = np.column_stack([np.ones_like(x), x])
    ols = np.linalg.lstsq(X, y, rcond=None)[0]
    mar_ols = float(np.abs(y - ols[0] - ols[1] * x).mean())
    assert row.mean_abs_resid <= mar_ols * 1.01


def test_sax_matches_numpy(spark):
    g = _monthly(spark)
    xs = g.x.to_numpy(dtype=np.float64)
    n = len(xs)
    mu = xs.sum() / n
    sd = math.sqrt((xs * xs).sum() / n - mu * mu)
    segs: dict[int, list[float]] = {}
    for i, v in enumerate(xs):
        segs.setdefault(i * 12 // n, []).append(v)
    word = ""
    n_a = n_d = 0
    for s in sorted(segs):
        z = (sum(segs[s]) / len(segs[s]) - mu) / sd
        sym = "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        word += sym
        n_a += sym == "a"
        n_d += sym == "d"
    row = REGISTRY["sax_monthly_revenue"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == n
    assert row.sax_word == word
    assert row.n_a == n_a and row.n_d == n_d
    assert len(row.sax_word) == min(12, n)


def test_page_hinkley_matches_numpy(spark):
    g = _monthly(spark)
    xs = g.x.to_numpy(dtype=np.float64)
    months = (g.y * 100 + g.mo).to_numpy()
    run_mean = np.cumsum(xs) / np.arange(1, len(xs) + 1)
    m_t = np.cumsum(xs - run_mean)
    ph = m_t - np.minimum.accumulate(m_t)
    lam = 2 * xs.sum() / len(xs)
    best = int(np.argmax(ph))  # numpy argmax takes the first max — same tiebreak
    alarms = np.nonzero(ph > lam)[0]
    row = REGISTRY["page_hinkley_revenue"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == len(xs)
    assert math.isclose(row.ph_max, ph[best], rel_tol=1e-6, abs_tol=0.02)
    assert row.ph_max_month == months[best]
    assert math.isclose(row.lambda_ if hasattr(row, "lambda_") else row["lambda"],
                        lam, rel_tol=1e-6, abs_tol=0.02)
    if len(alarms):
        assert row.first_alarm_month == months[alarms[0]]
    else:
        assert row.first_alarm_month is None


def test_pca_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    y = np.round(li.l_extendedprice.to_numpy(dtype=np.float64), 2) / 10000
    cov = np.cov(np.vstack([x, y]), bias=True)
    evals = np.linalg.eigvalsh(cov)
    l1, l2 = float(evals[1]), float(evals[0])
    angle = math.degrees(
        math.atan2(2 * cov[0, 1], cov[0, 0] - cov[1, 1]) / 2
    )
    row = REGISTRY["pca_axis_lineitem"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(x)
    assert math.isclose(row.lambda1, l1, rel_tol=1e-5, abs_tol=1e-6)
    assert math.isclose(row.lambda2, l2, rel_tol=1e-5, abs_tol=1e-6)
    assert math.isclose(
        row.var_explained_pc1, l1 / (l1 + l2), rel_tol=1e-5
    )
    assert math.isclose(row.pc1_angle_deg, angle, rel_tol=1e-4, abs_tol=1e-3)
    assert 0.5 <= row.var_explained_pc1 <= 1.0
