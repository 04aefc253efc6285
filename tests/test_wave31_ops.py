"""Independent reference-recompute tests for wave 31 (round 8):
Friedman, RANSAC, Gumbel block maxima, Cp/Cpk, I-MR chart, Burrows'
Delta — recomputed in numpy/pure Python at sf0.001 from the same
parquet.
"""

from __future__ import annotations

import hashlib
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
    return (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby(["y", "mo"])
        .x.sum()
        .reset_index()
        .sort_values(["y", "mo"])
        .reset_index(drop=True)
    )


def test_friedman_matches_python(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    n = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").toPandas()
    o = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey",
                right_on="c_custkey")
    o = o.merge(n[["n_nationkey", "n_name"]], left_on="c_nationkey",
                right_on="n_nationkey")
    d = pd.to_datetime(o.o_orderdate)
    o["y"], o["mo"] = d.dt.year, d.dt.month
    rev = (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby(["n_name", "y", "mo"]).x.sum().reset_index()
    )
    tot = rev.groupby("n_name").x.sum().reset_index()
    tot = tot.sort_values(["x", "n_name"], ascending=[False, True])
    top5 = list(tot.n_name[:5])
    months = rev[["y", "mo"]].drop_duplicates()
    k, nb = 5, len(months)
    rsum = {t: 0 for t in top5}
    for _, mrow in months.iterrows():
        vals = []
        for t in top5:
            sub = rev[(rev.n_name == t) & (rev.y == mrow.y) & (rev.mo == mrow.mo)]
            vals.append((float(sub.x.iloc[0]) if len(sub) else 0.0, t))
        for rnk, (_, t) in enumerate(sorted(vals), start=1):
            rsum[t] += rnk
    chi2 = 12.0 / (nb * k * (k + 1)) * sum(v * v for v in rsum.values()) \
        - 3.0 * nb * (k + 1)
    row = REGISTRY["friedman_nations_monthly"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == nb and row.k_nations == k
    assert math.isclose(row.friedman_chi2, chi2, rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(
        row.p_value, math.exp(-chi2 / 2) * (1 + chi2 / 2), rel_tol=1e-5
    )


def test_ransac_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    y = np.round(li.l_extendedprice.to_numpy(dtype=np.float64), 2)
    h = [
        hashlib.sha256(f"{ok}-{ln}".encode()).hexdigest()
        for ok, ln in zip(li.l_orderkey, li.l_linenumber)
    ]
    order = np.argsort(np.array(h), kind="mergesort")[:10]
    seeds = [(x[i], y[i]) for i in order]
    best = None
    for (i, (xa, ya)), (j, (xb, yb)) in combinations(enumerate(seeds, 1), 2):
        if xb == xa:
            continue
        slope = (yb - ya) / (xb - xa)
        inter = ya - slope * xa
        inliers = int((np.abs(y - (inter + slope * x)) <= 10000.0).sum())
        key = (-inliers, i, j)
        if best is None or key < best[0]:
            best = (key, slope, inter, inliers)
    _, slope, inter, inliers = best
    row = REGISTRY["ransac_line_fit"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(x)
    assert row.n_inliers == inliers
    assert math.isclose(row.slope, slope, rel_tol=1e-5, abs_tol=1e-5)
    assert math.isclose(row.intercept, inter, rel_tol=1e-4, abs_tol=1e-2)
    assert 0.0 < row.inlier_rate <= 1.0


def test_gumbel_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    daily = (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby("o_orderdate").x.sum().reset_index()
    )
    d = pd.to_datetime(daily.o_orderdate)
    bm = (
        daily.assign(y=d.dt.year, mo=d.dt.month)
        .groupby(["y", "mo"]).x.max().to_numpy(dtype=np.float64)
    )
    n = len(bm)
    mean = bm.sum() / n
    sd = math.sqrt(((bm * bm).sum() - bm.sum() ** 2 / n) / (n - 1))
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.57721566490153286 * beta
    rl = mu - beta * math.log(-math.log(1 - 1.0 / 12))
    row = REGISTRY["gumbel_block_maxima"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_blocks == n
    assert math.isclose(row.gumbel_mu, mu, rel_tol=1e-5, abs_tol=0.02)
    assert math.isclose(row.gumbel_beta, beta, rel_tol=1e-5, abs_tol=0.02)
    assert math.isclose(row.return_level_12, rl, rel_tol=1e-5, abs_tol=0.02)
    assert math.isclose(row.observed_max, bm.max(), abs_tol=0.005)
    # the once-a-year level must exceed the location parameter
    assert row.return_level_12 > row.gumbel_mu


def test_cpk_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    q = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    n = len(q)
    mean = q.sum() / n
    sd = math.sqrt(((q * q).sum() - q.sum() ** 2 / n) / (n - 1))
    row = REGISTRY["process_capability_cpk"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == n
    assert math.isclose(row.mean_qty, mean, rel_tol=1e-5)
    assert math.isclose(row.sd_qty, sd, rel_tol=1e-4)
    assert math.isclose(row.cp, (50 - 1) / (6 * sd), rel_tol=1e-3)
    assert math.isclose(
        row.cpk, min(50 - mean, mean - 1) / (3 * sd), rel_tol=1e-3
    )
    assert math.isclose(
        row.frac_outside, float(((q < 1) | (q > 50)).sum()) / n, abs_tol=1e-9
    )
    # Cpk cannot exceed Cp (centering penalty)
    assert row.cpk <= row.cp + 1e-9


def test_imr_matches_numpy(spark):
    g = _monthly(spark)
    xs = g.x.to_numpy(dtype=np.float64)
    mr = np.abs(np.diff(xs))
    xbar = xs.sum() / len(xs)
    mrbar = mr.sum() / len(mr)
    ucl, lcl = xbar + 2.66 * mrbar, xbar - 2.66 * mrbar
    row = REGISTRY["imr_control_chart"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == len(xs)
    assert math.isclose(row.center, xbar, rel_tol=1e-6, abs_tol=0.02)
    assert math.isclose(row.mr_bar, mrbar, rel_tol=1e-6, abs_tol=0.02)
    assert math.isclose(row.ucl, ucl, rel_tol=1e-6, abs_tol=0.02)
    assert math.isclose(row.lcl, lcl, rel_tol=1e-6, abs_tol=0.02)
    assert row.n_out_of_control == int(((xs > ucl) | (xs < lcl)).sum())


def test_burrows_delta_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    rows = []
    for _, r in docs.iterrows():
        for t in r.text.strip().lower().split():
            rows.append((r.source, t))
    df = pd.DataFrame(rows, columns=["source", "token"])
    counts = df.token.value_counts()
    panel = sorted(counts.index, key=lambda t: (-counts[t], t))[:30]
    totals = df.source.value_counts()
    sources = sorted(totals.index)
    f = {
        (s, t): len(df[(df.source == s) & (df.token == t)]) / totals[s]
        for s in sources
        for t in panel
    }
    z = {}
    for t in panel:
        vals = np.array([f[(s, t)] for s in sources])
        mu, sd = vals.mean(), vals.std()
        if sd > 0:
            for s in sources:
                z[(s, t)] = (f[(s, t)] - mu) / sd
    toks_used = sorted({t for (_, t) in z})
    deltas = []
    for a, b in combinations(sources, 2):
        ds = [abs(z[(a, t)] - z[(b, t)]) for t in toks_used]
        deltas.append((sum(ds) / len(ds), a, b))
    deltas.sort()
    got = REGISTRY["burrows_delta_sources"].fn(spark, SF_SMOKE).collect()
    assert len(got) == min(10, len(deltas))
    for row, (want_d, a, b) in zip(got, deltas[:10]):
        assert (row.source_a, row.source_b) == (a, b)
        assert row.n_tokens == len(toks_used)
        assert math.isclose(row.delta, want_d, rel_tol=1e-5, abs_tol=1e-6)
