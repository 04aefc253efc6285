"""Invariant tests for the governance family (Benford census,
Mahalanobis outliers, k-anonymity). Two-scale oracle parity pins exact
values; these pin the semantic contracts parity wouldn't explain if
broken — probability-mass closure, quadratic-form positivity and
ordering, census conservation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_benford_mass_and_counts(spark):
    rows = REGISTRY["benford_digit_census"].fn(spark, SF_ORACLE).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert math.isclose(sum(r.p_obs for r in rows), 1.0, rel_tol=1e-12)
    assert math.isclose(sum(r.p_benford for r in rows), 1.0, rel_tol=1e-12)
    assert all(r.chisq_term >= 0 for r in rows)
    n_orders = table(spark, SF_ORACLE, "orders").count()
    assert sum(r.n_obs for r in rows) == n_orders


def test_mahalanobis_descending_and_positive(spark):
    rows = REGISTRY["mahalanobis_outliers"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    d2s = [r.d2 for r in rows]
    assert all(v >= 0 for v in d2s)
    assert d2s == sorted(d2s, reverse=True)
    # outliers should be far beyond the typical point: with 2 dof,
    # E[d2] = 2, so the top-20 of ~60k rows must exceed that easily
    assert d2s[0] > 2.0


def test_mahalanobis_matches_numpy(spark):
    """The closed-form adjugate inverse equals numpy's Mahalanobis."""
    import numpy as np

    li = (
        table(spark, SF_ORACLE, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    x = li.to_numpy(dtype=float)
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    inv = np.linalg.inv(cov)
    d = x - mu
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    expect_top = float(np.sort(d2)[-1])
    got_top = REGISTRY["mahalanobis_outliers"].fn(spark, SF_ORACLE).collect()[0].d2
    assert math.isclose(got_top, expect_top, rel_tol=1e-9)


def test_kanon_census_conserves_rows(spark):
    rows = REGISTRY["k_anonymity_census"].fn(spark, SF_ORACLE).collect()
    assert rows
    n_customers = table(spark, SF_ORACLE, "customer").count()
    assert sum(r.n_rows for r in rows) == n_customers
    assert math.isclose(sum(r.row_share for r in rows), 1.0, rel_tol=1e-12)
    for r in rows:
        assert r.min_k <= r.max_k
        assert r.n_groups >= 1 and r.min_l >= 1
        lo, hi = {
            "1:unique": (1, 1),
            "2:k<5": (2, 4),
            "3:k<10": (5, 9),
            "4:k>=10": (10, None),
        }[r.k_band]
        assert r.min_k >= lo
        if hi is not None:
            assert r.max_k <= hi


def test_erasure_residual_zero_and_conservation(spark):
    r = REGISTRY["erasure_propagation_census"].fn(spark, SF_ORACLE).collect()[0]
    assert r.residual_subject_rows == 0
    n_events = table(spark, SF_ORACLE, "events").count()
    assert r.n_erased + r.n_kept == n_events
    assert r.n_subjects > 0 and r.n_erased >= r.n_subjects


def test_cdc_apply_state_consistent(spark):
    r = REGISTRY["cdc_apply_changes"].fn(spark, SF_ORACLE).collect()[0]
    assert r.n_ops == r.n_upserts + r.n_deletes
    n_keys = (
        table(spark, SF_ORACLE, "orders")
        .select((F.col("o_orderkey") % 5000).alias("k"))
        .distinct()
        .count()
    )
    assert r.n_live_keys + r.n_tombstones == n_keys
    assert r.n_tombstones > 0  # deletes actually reached the final state
    assert r.live_value_total > 0


def test_candidate_key_profile_truths(spark):
    rows = {(r.kind, r.subject): r for r in
            REGISTRY["candidate_key_profile"].fn(spark, SF_ORACLE).collect()}
    assert len(rows) == 5
    o = table(spark, SF_ORACLE, "orders")
    n = o.count()
    ndv_ok = o.select("o_orderkey").distinct().count()
    k = rows[("key", "o_orderkey")]
    assert k.n_rows == n and k.ndv_lhs == ndv_ok
    assert k.holds == (ndv_ok == n)
    # FD verdicts must match a direct recomputation
    fd = rows[("fd", "o_orderkey->o_custkey")]
    ndv_pair = o.select("o_orderkey", "o_custkey").distinct().count()
    assert fd.ndv_rhs == ndv_pair and fd.holds == (ndv_ok == ndv_pair)
    for r in rows.values():
        assert 0 < r.uniqueness <= 1.0
