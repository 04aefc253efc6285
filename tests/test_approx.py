"""Sketch-vs-exact error bounds (queries/approx.py): the approximate
scale-path aggregates must land within their declared error of the
oracle-checked exact twins.
"""

from __future__ import annotations

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_approx_distinct_within_rsd(spark):
    approx = REGISTRY["approx_distinct_counts"].fn(spark, SF_ORACLE).collect()[0]
    import pyspark.sql.functions as F
    from ocean_data_pipeline_spark.catalog import table

    li = table(spark, SF_ORACLE, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    ).collect()[0]
    for c in ("n_orders", "n_parts", "n_suppliers"):
        rel_err = abs(approx[c] - exact[c]) / exact[c]
        assert rel_err < 0.05, f"{c}: approx={approx[c]} exact={exact[c]} rel_err={rel_err:.3f}"


def test_approx_quartiles_near_exact(spark):
    approx = REGISTRY["approx_quartiles"].fn(spark, SF_ORACLE).collect()[0]
    exact = REGISTRY["quartiles_exact"].fn(spark, SF_ORACLE).collect()[0]
    for c in ("p25", "p50", "p75"):
        rel_err = abs(approx[c] - exact[c]) / abs(exact[c])
        assert rel_err < 0.01, f"{c}: approx={approx[c]} exact={exact[c]} rel_err={rel_err:.4f}"
