"""Distributed rank device (operators/ranks.py) vs the naive
single-partition global window — exact equality on adversarial data:
heavy ties on the range column (tie blocks larger than bucket targets),
groups, descending order, and n < k ntiles. The device must be a
drop-in: same values, same types, K-way parallel plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.ranks import (
    cume_dist_from_rank,
    ntile_from_rank,
    percent_rank_from_rank,
    with_global_row_number,
    with_running_aggs,
)


@pytest.fixture(scope="module")
def rows(spark):
    # 2000 rows, 37 heavily-tied value levels, unique id tiebreak,
    # 3 groups; deterministic contents, shuffled across partitions.
    df = (
        spark.range(2000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 37).cast("double").alias("v"),
            (F.col("id") % 3).cast("int").alias("g"),
            ((F.col("id") * 7919) % 1000).cast("long").alias("w"),
        )
        .repartition(16)
    )
    return df.localCheckpoint()


def test_global_row_number_matches_naive(rows):
    got = with_global_row_number(rows, ["v", "k"], "v", out="rn")
    want = rows.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "k"))
    )
    assert (
        got.select("k", "rn").exceptAll(want.select("k", "rn")).count() == 0
    )
    assert got.count() == want.count()


def test_grouped_row_number_matches_naive(rows):
    got = with_global_row_number(
        rows, ["v", "k"], "v", out="rn", partition_by=["g"]
    )
    want = rows.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("v", "k"))
    )
    assert (
        got.select("k", "rn").exceptAll(want.select("k", "rn")).count() == 0
    )


def test_descending_row_number_matches_naive(rows):
    got = with_global_row_number(
        rows, [F.desc("v"), F.asc("k")], "v", out="rn", range_desc=True
    )
    want = rows.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("k")))
    )
    assert (
        got.select("k", "rn").exceptAll(want.select("k", "rn")).count() == 0
    )


def test_running_sum_and_excl_min_match_naive(rows):
    got = with_running_aggs(
        rows,
        ["v", "k"],
        "v",
        {
            "cw": ("w", "sum", True),
            "prior_min": ("w", "min", False),
            "prior_max": ("w", "max", False),
        },
    )
    w_in = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    w_ex = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, -1)
    want = rows.select(
        "k",
        F.sum("w").over(w_in).alias("cw"),
        F.min("w").over(w_ex).alias("prior_min"),
        F.max("w").over(w_ex).alias("prior_max"),
    )
    got_sel = got.select("k", "cw", "prior_min", "prior_max")
    assert got_sel.exceptAll(want).count() == 0
    assert want.exceptAll(got_sel).count() == 0


@pytest.mark.parametrize("k", [3, 5, 10])
def test_ntile_expr_matches_builtin(spark, k):
    for n in (1, 2, k - 1, k, k + 1, 97, 100):
        df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
        got = df.select(
            "rn", ntile_from_rank(F.col("rn"), F.lit(n), k).alias("t")
        )
        want = spark.range(n).select(
            (F.col("id") + 1).alias("rn"),
            F.ntile(k).over(Window.orderBy("id")).alias("t"),
        )
        assert got.exceptAll(want).count() == 0, f"ntile({k}) n={n}"


def test_percent_rank_and_cume_dist_exprs(spark):
    n = 137
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = df.select(
        "rn",
        F.round(percent_rank_from_rank(F.col("rn"), F.lit(n)), 9).alias("pr"),
        F.round(cume_dist_from_rank(F.col("rn"), F.lit(n)), 9).alias("cd"),
    )
    want = spark.range(n).select(
        (F.col("id") + 1).alias("rn"),
        F.round(F.percent_rank().over(Window.orderBy("id")), 9).alias("pr"),
        F.round(F.cume_dist().over(Window.orderBy("id")), 9).alias("cd"),
    )
    assert got.exceptAll(want).count() == 0


def test_device_plan_is_not_single_partition(rows):
    """The point of the device: the big window must be partitioned by
    the bucket column, never a no-partition global sort."""
    got = with_global_row_number(rows, ["v", "k"], "v", out="rn")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    import re

    # every Window node must carry a partition spec (the tiny offset
    # window over the bucket census is partition-less but lives in the
    # OFFSET branch, which windows over <= num_buckets rows — accept it
    # only when its child is the census aggregate, i.e. it appears once)
    assert plan.count("Window") >= 1
    no_part = re.findall(r"partitionBy=\[\]", plan)
    assert len(no_part) <= 1, plan
