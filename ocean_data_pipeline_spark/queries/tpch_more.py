"""Additional TPC-H-shape relational queries (SURVEY.md §2-C/D
capability classes): existence semi-join with a non-equi condition
(q4), two-branch fact⋈dims volume join (q7), decorrelated scalar
aggregate threshold (q17), and group-having top-k (q18). Each shape
exercises a distinct plan family the star schema demands at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# --- q4 shape: EXISTS semi-join with non-equi date condition ----------

_LATE_SHIP_ORACLE = """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("order_priority_late_ship", oracle=_LATE_SHIP_ORACLE)
def order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: orders (one year, pushed-down range) that have at
    least one lineitem shipping > 60 days after order date, counted by
    priority. The EXISTS compiles to a LEFT SEMI join on the order key
    with the date comparison as a join-side residual — one pass over
    each table, no decorrelation needed because we never wrote the
    correlated form."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --- q7 shape: bidirectional nation-pair shipping volume --------------

_VOLUME_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS ship_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("nation_volume_shipping", oracle=_VOLUME_ORACLE)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: shipping volume between two nations by year — the
    two-branch star (supplier-nation on the lineitem side, customer-
    nation on the orders side) with an asymmetry predicate. Both
    nation dims broadcast pre-filtered to 2 rows, so the only real
    shuffle is lineitem⋈orders; the nation filters then semi-restrict
    both fact sides before that join under AQE."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supplier = table(spark, sf_dir, "supplier")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = nation.filter(pair).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(pair).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --- q17 shape: per-key scalar-aggregate threshold (decorrelated) -----

_SMALL_QTY_ORACLE = """
WITH lim AS (
  SELECT l_partkey AS lim_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) * 0.2 AS qty_limit
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN lim   ON lim.lim_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4' AND l.l_quantity < lim.qty_limit
"""


@register("small_qty_order_revenue", oracle=_SMALL_QTY_ORACLE)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: revenue from lineitems whose quantity is below 20%
    of their part's average — the correlated scalar subquery written
    directly in its decorrelated form (per-part aggregate joined back
    to the fact). The threshold is a decimal-sum / count double so
    both engines compute the identical boundary (a float avg would be
    partial-order-dependent). Brand filter broadcasts through part."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    lim = (
        li.groupBy(F.col("l_partkey").alias("lim_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(0.2)
            ).alias("qty_limit")
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(lim, li.l_partkey == lim.lim_partkey)
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q18 shape: group-HAVING filter then enriched top-k ---------------

_LARGE_ORDER_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice, big.sum_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


@register("large_order_customers", oracle=_LARGE_ORDER_ORACLE)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: orders whose total quantity exceeds 250, enriched
    with customer identity, top-20 by order value. The HAVING is a
    post-aggregate filter that shrinks the fact side to ~1% BEFORE the
    joins, so both joins broadcast the survivors; top-k compiles to
    TakeOrderedAndProject (no global sort). Tie-broken on o_orderkey
    for a total order (limit determinism)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
        .select("l_orderkey", F.col("sum_qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- order→ship latency percentiles (SLA view) ------------------------

_SHIP_LATENCY_ORACLE = """
WITH lat AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT priority,
       count(*) AS n_lineitems,
       quantile_cont(days, 0.50) AS p50_days,
       quantile_cont(days, 0.90) AS p90_days,
       quantile_cont(days, 0.99) AS p99_days,
       max(days) AS max_days
FROM lat GROUP BY priority ORDER BY priority
"""


@register("ship_latency_percentiles", oracle=_SHIP_LATENCY_ORACLE)
def ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency percentiles per priority class — the SLA
    latency-distribution view (p50/p90/p99/max of days between order
    and ship date). Exact interpolated percentiles: Spark `percentile`
    == DuckDB `quantile_cont` (the `quartiles_exact` parity), over an
    integer day-diff so the interpolation operands are identical.

    Plan shape: one fact-fact equi-join on the order key (orders is
    the smaller side but still corpus-scale — no broadcast; the SMJ /
    shuffled-hash choice is AQE's), then a 5-group percentile agg.
    Percentile aggregation holds per-group sorted buffers — at 100 TB
    swap in approx_percentile for the same shape with bounded memory
    (documented tradeoff, same as `quality_decile_filter`)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "priority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("days"),
    )
    return (
        lat.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.percentile("days", F.lit(0.50)).alias("p50_days"),
            F.percentile("days", F.lit(0.90)).alias("p90_days"),
            F.percentile("days", F.lit(0.99)).alias("p99_days"),
            F.max("days").alias("max_days"),
        )
        .orderBy("priority")
    )
