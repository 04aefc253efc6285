"""Broadcast-threshold sensitivity (the 100 TB join posture).

Three facts the plan must exhibit:
1. an UN-hinted dim join broadcasts purely from parquet size stats at
   the default autoBroadcastJoinThreshold (Catalyst's cost decision);
2. with the threshold disabled (-1) the same join degrades to
   SortMergeJoin — i.e. that plan was statistics-dependent;
3. our explicitly-hinted dim joins (revenue_by_nation) still broadcast
   with the threshold off — the hint, not fragile size stats, carries
   the plan. At 100 TB, post-filter dim sizes routinely exceed static
   thresholds even when the filtered dim is tiny; hints on true dims
   keep the fact side shuffle-free regardless.
"""

from __future__ import annotations

from contextlib import contextmanager

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@contextmanager
def _threshold(spark, value: str):
    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, orig)


def _unhinted_dim_join(spark):
    cust = table(spark, SF_ORACLE, "customer")
    nation = table(spark, SF_ORACLE, "nation")
    return cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "n_name"
    )


def test_unhinted_dim_join_broadcasts_from_stats(spark):
    plan = _plan(spark, _unhinted_dim_join(spark))
    assert "BroadcastHashJoin" in plan


def test_threshold_off_degrades_unhinted_join_to_sort_merge(spark):
    with _threshold(spark, "-1"):
        plan = _plan(spark, _unhinted_dim_join(spark))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_hinted_dim_joins_survive_threshold_off(spark):
    with _threshold(spark, "-1"):
        plan = _plan(spark, REGISTRY["revenue_by_nation"].fn(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan  # F.broadcast(nation/region) hints hold
