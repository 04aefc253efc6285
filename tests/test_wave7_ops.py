"""Invariant tests for the wave-7 time-series family (ACF, CUSUM,
LOCF). Two-scale oracle parity pins exact values; these pin the
semantic contracts: ACF equals the textbook centered formula (numpy),
CUSUM equals the iterative recursion, LOCF carries the right value
with the right staleness.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_acf_matches_numpy(spark):
    import numpy as np

    rows = REGISTRY["acf_monthly_revenue"].fn(spark, SF_ORACLE).collect()
    assert [r.k for r in rows] == [1, 2, 3, 4, 5, 6]
    m = (
        table(spark, SF_ORACLE, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("mo"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("x"))
        .orderBy("mo")
        .collect()
    )
    x = np.array([r.x for r in m])
    mu, den = x.mean(), ((x - x.mean()) ** 2).sum()
    for r in rows:
        expect = float(((x[: -r.k] - mu) * (x[r.k :] - mu)).sum() / den)
        assert math.isclose(r.acf, expect, rel_tol=1e-9), (r.k, r.acf, expect)
        assert -1.0 <= r.acf <= 1.0
        assert r.npairs == len(x) - r.k


def test_cusum_matches_iterative_recursion(spark):
    d = (
        table(spark, SF_ORACLE, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = [r.x for r in d]
    mu = sum(xs) / len(xs)
    s, best = 0.0, {}
    for r in d:
        s += r.x - mu
        best[r.day] = s
    got = REGISTRY["cusum_changepoint"].fn(spark, SF_ORACLE).collect()
    assert len(got) == 5
    abss = [r.abs_cusum for r in got]
    assert abss == sorted(abss, reverse=True)
    # the reported peak must be the global max of the recursion
    peak = max(abs(v) for v in best.values())
    assert math.isclose(got[0].abs_cusum, peak, rel_tol=1e-9)
    for r in got:
        assert math.isclose(r.cusum, best[r.day.date()], rel_tol=1e-9), r


def test_locf_carries_last_observation(spark):
    rows = REGISTRY["locf_forward_fill"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 61
    last_price, last_day = None, None
    for r in rows:
        if r.n_orders > 0:
            last_price, last_day = r.filled_price, r.day
            assert not r.was_filled
            assert r.gap_age_days == 0
        elif last_price is None:
            assert r.filled_price == 0.0 and not r.was_filled
            assert r.gap_age_days == -1
        else:
            assert r.filled_price == last_price
            assert r.was_filled
            assert r.gap_age_days == (r.day - last_day).days
