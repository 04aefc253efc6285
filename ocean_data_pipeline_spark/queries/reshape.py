"""Reshaping + time-spine queries: gap-fill resample, unpivot (wide →
long), pivot (long → wide) — the time-series/reporting surface a
hypertable-style engine owes its users (generalizes the reference's
fixed monthly axis, config.py:37-42, where the grid guarantees density;
real series have holes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# --- gap-filled daily series ------------------------------------------

_GAPFILL_ORACLE = """
WITH spine AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '1995-03-01', DATE '1995-04-30', INTERVAL 1 DAY) AS t(d)
),
daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-03-01'
    AND o_orderdate < TIMESTAMP '1995-05-01'
  GROUP BY 1
)
SELECT s.day,
       coalesce(d.n_orders, 0) AS n_orders,
       coalesce(d.total_price, 0.0) AS total_price,
       CAST(d.day IS NULL AS BOOLEAN) AS gap_filled
FROM spine s LEFT JOIN daily d USING (day)
ORDER BY s.day
"""


@register("daily_series_gapfill", oracle=_GAPFILL_ORACLE)
def daily_series_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense date spine (sequence + explode) LEFT JOIN sparse daily
    aggregates; missing days materialize as zero rows, flagged.

    Scale: the spine is O(days) — generated, never scanned; the join
    broadcasts the spine against the aggregated (already tiny) side.
    The reference never needed this because its grid axis is dense by
    construction; any real ingest pipeline needs the resample."""
    orders = table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-03-01").cast("date"),
                F.lit("1995-04-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-05-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )
    return (
        spine.join(daily.withColumnRenamed("day", "d_day"),
                   spine.day == F.col("d_day"), "left")
        .select(
            # timestamp, not date: DuckDB DATE lands in pandas as
            # datetime64 while Spark DateType lands as object(date) —
            # the driver's value-hash sees those as different.
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_price", F.lit(0.0)).alias("total_price"),
            F.col("d_day").isNull().alias("gap_filled"),
        )
        .orderBy("day")
    )


# --- unpivot (wide → long) --------------------------------------------

_UNPIVOT_ORACLE = """
WITH src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
  FROM lineitem WHERE l_orderkey < 100
)
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM src
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
ORDER BY l_orderkey, l_linenumber, measure
"""


@register("unpivot_measures", oracle=_UNPIVOT_ORACLE)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long on the lineitem measures (Spark 3.4+ unpivot — an
    Expand node: rows × measures in one pass, no self-union rescans;
    this is §2-D agg-value-ranges' per-variable layout as an operator).
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


# --- pivot (long → wide) ----------------------------------------------

_PIVOT_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders
GROUP BY 1 ORDER BY order_year
"""


@register("pivot_status_by_year", oracle=_PIVOT_ORACLE)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long → wide: order counts per status column by year. The pivot
    value list is DECLARED (no distinct-scan planning pass), so the
    aggregation is one shuffle like any groupBy — the 100 TB-safe way
    to pivot."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("order_year")
    )


# --- LOCF forward fill ------------------------------------------------

_LOCF_ORACLE = """
WITH spine AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '1995-03-01', DATE '1995-04-30', INTERVAL 1 DAY) AS t(d)
),
daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-03-01'
    AND o_orderdate < TIMESTAMP '1995-05-01'
  GROUP BY 1
),
j AS (
  SELECT s.day, d.day AS obs_day, d.n_orders, d.total_price
  FROM spine s LEFT JOIN daily d USING (day)
),
f AS (
  SELECT day,
         obs_day,
         coalesce(n_orders, 0) AS n_orders,
         last_value(total_price IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS locf,
         last_value(obs_day IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS src_day
  FROM j
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(n_orders AS BIGINT) AS n_orders,
       coalesce(locf, 0.0) AS filled_price,
       CAST(obs_day IS NULL AND src_day IS NOT NULL AS BOOLEAN) AS was_filled,
       CAST(coalesce(date_diff('day', src_day, day), -1) AS BIGINT) AS gap_age_days
FROM f
ORDER BY day
"""


@register("locf_forward_fill", oracle=_LOCF_ORACLE)
def locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over the dense date spine: gap
    days inherit the most recent observed daily total (the sensor-fill
    semantics `daily_series_gapfill` deliberately does NOT provide —
    that one fills zeros), with the staleness of each carried value
    reported as `gap_age_days`. Days before the first observation stay
    at 0.0 with age -1.

    Implementation is one `last(..., ignorenulls=True)` running window
    over the spine — the carried value AND its source day come from
    the same frame, so fill and staleness can't disagree. Scale: the
    window runs on the O(days) spine, never on facts; per-entity
    variants would add the entity key to the window partition."""
    orders = table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-03-01").cast("date"),
                F.lit("1995-04-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-05-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
    j = spine.join(
        daily.withColumnRenamed("day", "obs_day"),
        spine.day == F.col("obs_day"),
        "left",
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    f = j.select(
        "day",
        "obs_day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.last("total_price", ignorenulls=True).over(w).alias("locf"),
        F.last("obs_day", ignorenulls=True).over(w).alias("src_day"),
    )
    return f.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.coalesce("locf", F.lit(0.0)).alias("filled_price"),
        (F.col("obs_day").isNull() & F.col("src_day").isNotNull()).alias("was_filled"),
        F.coalesce(F.datediff("day", "src_day"), F.lit(-1))
        .cast("bigint")
        .alias("gap_age_days"),
    ).orderBy("day")
