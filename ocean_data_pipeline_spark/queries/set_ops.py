"""Set operations (SURVEY.md §2-E setops): union/intersect/except over
overlapping ingestion batches — the engine-level capability for merging
extraction batches (the reference re-extracts into overlapping CSVs;
multi-batch merge is the distributed generalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

_UNION_ORACLE = """
WITH h1 AS (
  SELECT o_orderkey, o_orderstatus FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-09-01'
), h2 AS (
  SELECT o_orderkey, o_orderstatus FROM orders
  WHERE o_orderdate >= DATE '1996-06-01' AND o_orderdate < DATE '1997-01-01'
)
SELECT o_orderstatus AS order_status, count(*) AS n_orders
FROM (SELECT * FROM h1 UNION SELECT * FROM h2)
GROUP BY o_orderstatus
ORDER BY order_status
"""


@register("union_batches_dedup", oracle=_UNION_ORACLE)
def union_batches_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-batch merge: unionByName + distinct (UNION semantics).
    The dedup shuffle hashes only the projected 2 columns."""
    o = table(spark, sf_dir, "orders")
    h1 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-09-01").cast("date"))
    ).select("o_orderkey", "o_orderstatus")
    h2 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-06-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_orderstatus")
    return (
        h1.unionByName(h2)
        .distinct()
        .groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_status")
    )


_INTERSECT_ORACLE = """
SELECT count(*) AS n_repeat_customers FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
)
"""


@register("intersect_customers", oracle=_INTERSECT_ORACLE)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    ).select("o_custkey")
    return y96.intersect(y97).agg(F.count(F.lit(1)).alias("n_repeat_customers"))


_EXCEPT_ORACLE = """
SELECT count(*) AS n_churned_customers FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
)
"""


@register("except_customers", oracle=_EXCEPT_ORACLE)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    ).select("o_custkey")
    # subtract = set EXCEPT (exceptAll would keep keys whose multiplicity
    # merely differs between the two years — wrong semantics here).
    return y96.subtract(y97).agg(F.count(F.lit(1)).alias("n_churned_customers"))
