"""Invariant + reference-recompute tests for wave 22: Poisson GLM via
unrolled IRLS, LATERAL top-N SQL surface.
"""

from __future__ import annotations

import math

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def _fit_poisson_numpy(y, x, rounds=4):
    b0 = math.log(y.mean())
    b1 = 0.0
    for _ in range(rounds):
        eta = b0 + b1 * x
        mu = np.exp(eta)
        z = eta + (y - mu) / mu
        sw, swx = mu.sum(), (mu * x).sum()
        swxx = (mu * x * x).sum()
        swz, swxz = (mu * z).sum(), (mu * x * z).sum()
        det = sw * swxx - swx * swx
        b0 = (swxx * swz - swx * swxz) / det
        b1 = (sw * swxz - swx * swz) / det
    return b0, b1


def test_poisson_glm_matches_numpy_irls(spark):
    row = REGISTRY["poisson_glm_irls"].fn(spark, SF_SMOKE).collect()[0]
    cust = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_custkey", "c_acctbal")
        .toPandas()
    )
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey")
        .toPandas()
    )
    counts = orders.o_custkey.value_counts()
    y = cust.c_custkey.map(counts).fillna(0).to_numpy(dtype=np.float64)
    x = cust.c_acctbal.to_numpy(dtype=np.float64) / 10000
    b0, b1 = _fit_poisson_numpy(y, x)
    assert row.n_customers == len(cust)
    assert abs(row.intercept - b0) < 1e-4
    assert abs(row.slope_per_10k - b1) < 1e-4
    assert abs(row.rate_ratio_per_10k - math.exp(b1)) < 1e-4
    mu = np.exp(b0 + b1 * x)
    dev = 2 * float(
        (np.where(y > 0, y * np.log(np.where(y > 0, y, 1) / mu), 0) - (y - mu)).sum()
    )
    assert abs(row.deviance - dev) < 0.01
    assert row.deviance >= 0
    # intercept should sit near log(mean rate)
    assert abs(row.intercept - math.log(y.mean())) < 1.0


def test_poisson_glm_converged(spark):
    """One extra IRLS round moves coefficients by < 1e-6 — 4 rounds is
    converged, not truncated."""
    cust = (
        spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .select("c_custkey", "c_acctbal")
        .toPandas()
    )
    orders = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .select("o_custkey")
        .toPandas()
    )
    counts = orders.o_custkey.value_counts()
    y = cust.c_custkey.map(counts).fillna(0).to_numpy(dtype=np.float64)
    x = cust.c_acctbal.to_numpy(dtype=np.float64) / 10000
    b4 = _fit_poisson_numpy(y, x, rounds=4)
    b5 = _fit_poisson_numpy(y, x, rounds=5)
    assert abs(b4[0] - b5[0]) < 1e-6
    assert abs(b4[1] - b5[1]) < 1e-6


def test_lateral_topn_matches_window_formulation(spark):
    out = (
        REGISTRY["sql_lateral_topn_per_region"].fn(spark, SF_ORACLE).toPandas()
    )
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").toPandas()
    nat = spark.read.parquet(f"{SF_ORACLE}/nation.parquet").toPandas()
    reg = spark.read.parquet(f"{SF_ORACLE}/region.parquet").toPandas()
    merged = (
        cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    counts = (
        merged.groupby(["r_name", "n_name"]).size().reset_index(name="n")
    )
    expect = []
    for r, grp in counts.groupby("r_name"):
        top = grp.sort_values(["n", "n_name"], ascending=[False, True]).head(2)
        for _, t in top.iterrows():
            expect.append((r, t.n_name, t.n))
    got = list(zip(out.region_name, out.nation_name, out.n_customers))
    assert sorted(got) == sorted(expect)
    # exactly 2 per region
    assert out.groupby("region_name").size().eq(2).all()
