"""Bucketed co-located join (SURVEY.md §4 partitioning posture): tables
bucketed on the join key join WITHOUT a shuffle — the plan for the
repeated fact⋈fact joins a 100 TB warehouse would pre-bucket.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from ocean_data_pipeline_spark.catalog import table

    for name, key in (("orders_b", "o_orderkey"), ("lineitem_b", "l_orderkey")):
        src = "orders" if name == "orders_b" else "lineitem"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            table(spark, SF, src)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    import pyspark.sql.functions as F

    orders_b, lineitem_b = bucketed_tables
    # bucketed-scan parallelism == bucket count; disable broadcast so
    # the test exercises the sort-merge path bucketing is for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(orders_b)
            .join(
                spark.table(lineitem_b),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _formatted_plan(spark, joined)
        join_section = plan.split("HashAggregate")[0]
        # the join inputs scan bucketed tables directly: no Exchange
        # between scan and SortMergeJoin
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        # and the result matches the plain (shuffled) join
        plain = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
