"""Independent reference-recompute tests for wave 28 (round 7): ridge
vs OLS, readability, and t-closeness — recomputed in numpy/pure Python
at sf0.001."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def test_ridge_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x1 = np.round(li.l_quantity.to_numpy(dtype=np.float64), 2)
    x2 = np.round(li.l_discount.to_numpy(dtype=np.float64), 2)
    y = np.round(li.l_extendedprice.to_numpy(dtype=np.float64), 2)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    lam = 10000.0
    pen = np.diag([0.0, lam, lam])
    ridge = np.linalg.solve(X.T @ X + pen, X.T @ y)
    ols = np.linalg.solve(X.T @ X, X.T @ y)
    row = REGISTRY["ridge_price_regression"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(y)
    assert math.isclose(row.ridge_intercept, ridge[0], rel_tol=1e-4)
    assert math.isclose(row.ridge_beta_quantity, ridge[1], rel_tol=1e-4)
    assert math.isclose(row.ridge_beta_discount, ridge[2], rel_tol=1e-3)
    assert math.isclose(row.ols_beta_quantity, ols[1], rel_tol=1e-4)
    # L2 penalty shrinks the coefficient norm
    assert 0.0 < row.coef_shrinkage < 1.0
    want_shrink = math.sqrt(
        (ridge[1] ** 2 + ridge[2] ** 2) / (ols[1] ** 2 + ols[2] ** 2)
    )
    # engine displays round(., 6): only abs_tol is meaningful this small
    assert math.isclose(row.coef_shrinkage, want_shrink, abs_tol=5e-7)


def test_readability_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    per_source = defaultdict(list)
    for _, d in docs.iterrows():
        t = d.text
        if not t.strip():
            continue
        w = max(len(re.split(r"\s+", t.strip().lower())), 1)
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        syl = max(len(re.findall(r"[aeiouy]+", t.lower())), 1)
        per_source[d.source].append(206.835 - 1.015 * (w / s) - 84.6 * (syl / w))
    rows = {
        r.source: r
        for r in REGISTRY["readability_census"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(per_source)
    for src, fres in per_source.items():
        r = rows[src]
        assert r.n_docs == len(fres)
        assert math.isclose(r.mean_fre, sum(fres) / len(fres), abs_tol=1e-4)
        assert math.isclose(r.min_fre, min(fres), abs_tol=1e-6)
        assert r.n_very_difficult == sum(1 for f in fres if f < 30)


def test_t_closeness_matches_numpy(spark):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    x = cust.c_acctbal.to_numpy(dtype=np.float64)
    mn, mx = x.min(), x.max()
    bins = np.minimum(9, np.floor((x - mn) * 10 / (mx - mn)).astype(int))
    n = len(x)
    global_counts = np.bincount(bins, minlength=10)
    rows = {
        r.segment: r
        for r in REGISTRY["t_closeness_census"].fn(spark, SF_SMOKE).collect()
    }
    for seg, sub in cust.assign(bin=bins).groupby("c_mktsegment"):
        gc = np.bincount(sub.bin.to_numpy(), minlength=10)
        n_g = len(sub)
        p = gc / n_g
        q = global_counts / n
        emd = np.abs(np.cumsum(p - q)).sum() / 9
        r = rows[seg]
        assert r.n_customers == n_g
        assert math.isclose(r.t_closeness, emd, abs_tol=1e-6), seg
        assert 0.0 <= r.t_closeness <= 1.0
