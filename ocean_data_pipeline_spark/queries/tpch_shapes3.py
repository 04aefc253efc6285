"""Final TPC-H-shape sweep (SURVEY.md §2-C/D capability classes):
q6 (pure filter-agg), q8 (market share CASE-ratio over an 8-way star),
q9 (profit by nation x year), q10 (returned-item top-k enrichment),
q12 (late-shipment conditional counts), q13 (outer-join distribution),
q14 (promo share ratio), q20 (aggregate-threshold semi chain).

With this module every one of the 22 TPC-H query plan families has a
registered shape. The testdata schema is a trimmed TPC-H (no partsupp,
l_shipmode, l_commitdate/receiptdate, comments/phones — TESTDATA.md),
so q9/q12/q20 substitute equivalent predicates over existing columns
while keeping the plan family intact; each docstring notes the swap.

Decimal discipline throughout: money sums are computed over
DECIMAL(18,2)/(18,4) casts and cast to DOUBLE only at the end, so the
oracle (DuckDB) and Spark agree bit-for-bit regardless of partial-agg
ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _rev():
    """Exact per-line revenue: extendedprice * (1 - discount)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )


# --- q6 shape: scan-only filter + aggregate ---------------------------

_FORECAST_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue_change", oracle=_FORECAST_ORACLE)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6 shape: the purest scan query — three conjunctive range
    predicates and a global sum, no join, no groupBy. Every predicate
    is a parquet-pushable comparison (PushedFilters on l_shipdate /
    l_discount / l_quantity), so at 100 TB this is an embarrassingly
    parallel scan with row-group skipping via min/max stats and a
    single partial->final agg exchange of ONE row per task."""
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (disc >= 0.05)
            & (disc <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q8 shape: market-share CASE ratio over the full star -------------

_MKT_SHARE_ORACLE = """
WITH m AS (
  SELECT year(o.o_orderdate) AS order_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT order_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM m
GROUP BY order_year
ORDER BY order_year
"""


@register("nation_market_share", oracle=_MKT_SHARE_ORACLE)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape: NATION_7's share of ASIA's PROMO-part market by year —
    the widest star in the sweep (lineitem + 7 dimension hops, nation
    joined twice under different roles). Every dimension broadcasts
    (part pre-filtered to one type, region to one row, so the customer
    branch semi-restricts orders before the only real shuffle,
    lineitem><orders). The share is a conditional-sum / total-sum ratio
    computed in one pass — both sums are exact decimals, divided once
    as doubles, so no float partial-order drift."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_regionkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    zero = F.lit(0).cast("decimal(18,6)")
    # Broadcast hints only on dims that stay tiny at any scale (region,
    # nation, the type-filtered part slice); supplier/customer grow with
    # the scale factor, so AQE's runtime size check decides for them —
    # at sf0.01 they broadcast anyway, at 100 TB they sort-merge.
    m = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("order_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        m.groupBy("order_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# --- q9 shape: profit by (nation, year) over a name-filtered part set -

_PROFIT_ORACLE = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, order_year
ORDER BY nation, order_year DESC
"""


@register("product_profit_by_nation", oracle=_PROFIT_ORACLE)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape: profit per supplier-nation per year for parts whose
    name contains 'gear' (reference q9 uses '%green%'; our part names
    are '<adj> <noun>'). Testdata has no partsupp, so profit omits the
    ps_supplycost * qty term and is pure discounted revenue — the plan
    family (substring-filtered part dim driving a fact multi-join,
    grouped on dim attributes x year) is unchanged. The LIKE cannot be
    pushed to a parquet row-group stat, but it prunes part to a
    broadcast before touching lineitem."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supplier = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("order_year"))
    )


# --- q10 shape: returned-item customer ranking ------------------------

_RETURNED_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_item_customers", oracle=_RETURNED_ORACLE)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 shape: customers who returned the most revenue in 1996Q1 —
    a quarter-windowed fact join grouped on the full customer identity,
    top-20 by lost revenue. The orderdate range is pushed into the
    orders scan and the returnflag equality into lineitem, so the join
    sees two pre-shrunk sides; top-k is TakeOrderedAndProject (no
    global sort), tie-broken on c_custkey for limit determinism."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- q12 shape: late-shipment priority counts (conditional agg) -------

_LATE_PRIORITY_ORACLE = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register("late_shipment_priority", oracle=_LATE_PRIORITY_ORACLE)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape: among 1996 shipments that went out >45 days after
    their order date, count high- vs low-priority order lines per
    category. Testdata has no l_shipmode/l_commitdate/l_receiptdate
    (reference q12 groups by shipmode and tests commit/receipt lag), so
    the grouping column is l_returnflag and lateness is ship-vs-order
    lag — same family: an equi-join with a non-equi date residual
    feeding two CASE-conditional counts. The year range pushes into the
    lineitem scan; the residual comparison runs inside the join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 45 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- q13 shape: outer-join order-count distribution -------------------

_CUSTDIST_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_distribution", oracle=_CUSTDIST_ORACLE)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: the distribution of per-customer order counts,
    keeping zero-order customers — the canonical LEFT OUTER join with a
    filter INSIDE the join condition (reference q13 excludes comment-
    matched orders; no o_comment here, so non-URGENT plays that role —
    putting it in WHERE would wrongly drop the NULL rows the outer join
    exists to keep). Two cascaded aggregations: per-customer count
    (shuffle on custkey) then the count-of-counts (tiny second
    shuffle). count(o_orderkey) counts non-NULL only, so unmatched
    customers land in the c_count=0 bucket."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (orders.o_custkey == customer.c_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- q14 shape: promo revenue percentage ------------------------------

_PROMO_SHARE_ORACLE = """
SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS DOUBLE)
         AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-06-01'
"""


@register("promo_revenue_share", oracle=_PROMO_SHARE_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: percentage of 1996-spring revenue from PROMO parts —
    a single-join conditional-ratio aggregate producing one row. The
    date window pushes into the lineitem scan; part broadcasts; both
    the CASE'd numerator and the denominator are exact decimal sums
    divided once as doubles (no per-row float division)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-06-01"))
    )
    part = table(spark, sf_dir, "part")
    vol = _rev()
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q20 shape: aggregate-threshold semi-join chain -------------------

_DOMINANT_SUPPLIER_ORACLE = """
WITH part_qty AS (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey
),
supp_qty AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS s_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT sq.l_suppkey
  FROM supp_qty sq
  JOIN part_qty pq ON pq.l_partkey = sq.l_partkey
  JOIN part p ON p.p_partkey = sq.l_partkey
  WHERE p.p_type = 'SMALL' AND sq.s_qty > 0.5 * pq.total_qty
)
ORDER BY s.s_name
"""


@register("dominant_part_suppliers", oracle=_DOMINANT_SUPPLIER_ORACLE)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: suppliers who shipped more than half of some
    SMALL-type part's total 1996 volume — the nested-IN chain built
    from a per-(part,supplier) aggregate compared against a per-part
    aggregate threshold. Testdata has no partsupp (reference q20
    thresholds ps_availqty against shipped qty), so both sides of the
    threshold derive from lineitem; the plan family — aggregate ->
    threshold join -> DISTINCT key set -> LEFT SEMI into the dim —
    is unchanged. Both 1996 scans of lineitem share one pushed date
    filter; the exact-decimal sums make the 0.5x boundary identical in
    both engines. The qualifying-supplier set semi-joins into the
    supplier dim (no duplicates to dedup post-join)."""
    li_1996 = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    part_qty = li_1996.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(qty).alias("total_qty")
    )
    supp_qty = li_1996.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty).alias("s_qty"))
    small = table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    qualifying = (
        supp_qty.join(part_qty, supp_qty.l_partkey == part_qty.pq_partkey)
        .join(F.broadcast(small), supp_qty.l_partkey == small.p_partkey)
        .filter(F.col("s_qty") > F.lit(0.5) * F.col("total_qty"))
        .select("l_suppkey")
    )
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        supplier.join(qualifying, supplier.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )
