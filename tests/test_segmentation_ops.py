"""Invariant tests for the segmentation/concentration family. Parity
pins values; these pin the semantics: quintile balance, Gini against
a pure-Python recompute, HHI bounds, ABC boundary correctness, PSI
term identity.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_rfm_census_conserves_customers(spark):
    rows = REGISTRY["rfm_segmentation"].fn(spark, SF_ORACLE).collect()
    n_cust = table(spark, SF_ORACLE, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
    # quintiles are balanced per dimension (ntile: sizes differ by <=1)
    for dim in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[getattr(r, dim)] = per.get(getattr(r, dim), 0) + r.n_customers
        sizes = sorted(per.values())
        assert sizes[-1] - sizes[0] <= 1


def test_gini_matches_python(spark):
    r = REGISTRY["gini_customer_spend"].fn(spark, SF_ORACLE).collect()[0]
    spend = (
        table(spark, SF_ORACLE, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
        .collect()
    )
    xs = sorted(float(v.x) for v in spend)
    n, sx = len(xs), sum(xs)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sx) - (n + 1.0) / n
    assert r.n_customers == n
    assert math.isclose(r.gini, gini, rel_tol=1e-9)
    assert 0.0 <= r.gini < 1.0


def test_hhi_bounds(spark):
    rows = REGISTRY["market_concentration_hhi"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # HHI of n equal firms is 1/n; bounds are (1/n, 1]
        assert 1.0 / r.n_suppliers - 1e-12 <= r.hhi <= 1.0 + 1e-12
        assert r.top_share <= 1.0
        assert r.hhi <= r.top_share + 1e-12 or r.n_suppliers == 1
        # top firm's squared share alone cannot exceed HHI
        assert r.top_share * r.top_share <= r.hhi + 1e-12


def test_abc_boundaries(spark):
    rows = {r.abc_class: r for r in
            REGISTRY["abc_pareto_classes"].fn(spark, SF_ORACLE).collect()}
    assert set(rows) == {"A", "B", "C"}
    total_share = sum(r.revenue_share for r in rows.values())
    assert math.isclose(total_share, 1.0, rel_tol=1e-12)
    # A holds at most 70% (boundary exact), A+B at most 90%
    assert rows["A"].revenue_share <= 0.7 + 1e-12
    assert rows["A"].revenue_share + rows["B"].revenue_share <= 0.9 + 1e-12
    # rank ordering: per-part average revenue is monotone A >= B >= C
    # (the synthetic catalog is revenue-uniform, so part counts need
    # not be Pareto-shaped — the ordering guarantee is on averages)
    avg = {k: r.class_revenue / r.n_parts for k, r in rows.items()}
    assert avg["A"] >= avg["B"] >= avg["C"]


def test_psi_term_identity(spark):
    rows = REGISTRY["psi_drift_price"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    t_ref = sum(r.n_ref for r in rows)
    t_cur = sum(r.n_cur for r in rows)
    psi = rows[0].psi
    recomputed = 0.0
    for r in rows:
        assert r.psi == psi  # total carried identically on every row
        if r.n_ref > 0 and r.n_cur > 0:
            p, q = r.n_ref / t_ref, r.n_cur / t_cur
            term = (p - q) * math.log(p / q)
            # psi_term is quantized at 12dp (cross-engine ln/round
            # parity, round 10) -> up to 5e-13 absolute deviation
            assert math.isclose(r.psi_term, term, rel_tol=1e-12, abs_tol=5.1e-13)
            recomputed += term
    assert math.isclose(psi, recomputed, rel_tol=1e-9)
    # reference deciles: each ref bin holds ~10%
    for r in rows:
        assert abs(r.n_ref - t_ref / 10) <= t_ref * 0.02 + 2
