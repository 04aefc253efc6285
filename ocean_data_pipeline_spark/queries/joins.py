"""Join surface (SURVEY.md §2-C): broadcast/hash equi-joins, semi/anti,
range θ-join, as-of join — exercised on the star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.joins import asof_join, nearby_join
from ocean_data_pipeline_spark.queries import register

# --- revenue_by_nation: the canonical fact⋈dims star join (join-inner /
# join-broadcast). -----------------------------------------------------

_REVENUE_ORACLE = """
SELECT
  r_name                                                     AS region_name,
  n_name                                                     AS nation_name,
  count(*)                                                   AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)   AS total_revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
ORDER BY region_name, nation_name
"""


@register("revenue_by_nation", oracle=_REVENUE_ORACLE)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact `orders` shuffles once on custkey; `customer` is
    mid-size (hash join under AQE), `nation`/`region` are broadcast —
    no shuffle for the dims at any scale."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("region_name", "nation_name")
    )


# --- semi/anti joins: existence / absence (join-semi, join-anti; the
# cache-probe pattern cache_manager.py:90-95 generalized). -------------

_SEMI_ORACLE = """
SELECT c_mktsegment AS mktsegment, count(*) AS n_customers_with_orders
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY mktsegment
"""


@register("semi_join_customers", oracle=_SEMI_ORACLE)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: no payload from the right side crosses the shuffle."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
        .orderBy("mktsegment")
    )


_ANTI_ORACLE = """
SELECT c_mktsegment AS mktsegment, count(*) AS n_customers_without_orders
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate < DATE '1996-01-01'
)
GROUP BY c_mktsegment
ORDER BY mktsegment
"""


@register("anti_join_customers", oracle=_ANTI_ORACLE)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no early (pre-1996) order: the filter lands on the
    build side BEFORE the anti-join, shrinking the shuffled input."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
        .orderBy("mktsegment")
    )


# --- left outer join with null accounting (join-left). ----------------

_LEFT_ORACLE = """
SELECT
  count(*)                                           AS n_parts,
  count(l_partkey)                                   AS n_parts_sold,
  count(*) - count(l_partkey)                        AS n_parts_never_sold
FROM part
LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) li ON l_partkey = p_partkey
"""


@register("left_join_parts", oracle=_LEFT_ORACLE)
def left_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join against a pre-deduped build side (distinct first —
    shrinks the join input instead of exploding matches)."""
    part = table(spark, sf_dir, "part")
    sold = table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    joined = part.join(sold, part.p_partkey == sold.l_partkey, "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.count("l_partkey").alias("n_parts_sold"),
        (F.count(F.lit(1)) - F.count("l_partkey")).alias("n_parts_never_sold"),
    )


# --- nearby θ-join (join-range-nearby): the reference's nearby-cache
# lookup re-expressed over a derived points table. Coordinates are
# derived deterministically from custkey on the reference's 0.25° grid
# (config.py:24-36: lat 10..32.5, lon −85..−70). -----------------------

_NEARBY_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         10.0  + (c_custkey % 91) * 0.25 AS latitude,
         -85.0 + (c_custkey % 61) * 0.25 AS longitude
  FROM customer
)
SELECT c_custkey, latitude, longitude,
       abs(latitude - 21.0) + abs(longitude - (-77.0))        AS l1_distance,
       sqrt(pow(latitude - 21.0, 2) + pow(longitude - (-77.0), 2)) AS l2_distance
FROM pts
WHERE abs(latitude - 21.0) < 2.0 AND abs(longitude - (-77.0)) < 2.0
ORDER BY l1_distance, c_custkey
"""


@register("nearby_points", oracle=_NEARBY_ORACLE)
def nearby_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius lookup ordered nearest-first with custkey tiebreak
    (total order → stable hash). Probe side is 1 row → broadcast
    nested-loop, the only legal strategy for a θ-predicate."""
    customer = table(spark, sf_dir, "customer")
    pts = customer.select(
        "c_custkey",
        (F.lit(10.0) + (F.col("c_custkey") % 91) * F.lit(0.25)).alias("latitude"),
        (F.lit(-85.0) + (F.col("c_custkey") % 61) * F.lit(0.25)).alias("longitude"),
    )
    probe = spark.range(1).select(
        F.lit(21.0).alias("p_latitude"), F.lit(-77.0).alias("p_longitude")
    )
    return (
        nearby_join(pts, probe, radius=2.0)
        .select("c_custkey", "latitude", "longitude", "l1_distance", "l2_distance")
        .orderBy("l1_distance", "c_custkey")
    )


# --- as-of join (join-asof): each order aligned to the latest
# priority-policy row effective at or before its order date. The policy
# table is derived deterministically (first order date per priority →
# that priority's "effective-from"). DuckDB has native ASOF JOIN —
# ideal oracle for our union+window implementation. --------------------

_ASOF_ORACLE = """
WITH policy AS (
  SELECT o_orderpriority AS priority,
         min(o_orderdate) + INTERVAL 90 DAY AS eff_from,
         count(*) AS policy_weight
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderkey AS orderkey,
       p.policy_weight AS policy_weight
FROM orders o
ASOF LEFT JOIN policy p
  ON o.o_orderpriority = p.priority AND o.o_orderdate >= p.eff_from
ORDER BY orderkey
"""


@register("asof_policy_join", oracle=_ASOF_ORACLE)
def asof_policy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """as-of join via union+window (see operators.joins.asof_join)."""
    orders = table(spark, sf_dir, "orders")
    policy = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.date_add(F.min("o_orderdate").cast("date"), 90)
        .cast("timestamp")
        .alias("eff_from"),
        F.count(F.lit(1)).alias("policy_weight"),
    )
    left = orders.select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    joined = asof_join(
        left,
        policy,
        left_on="o_orderdate",
        right_on="eff_from",
        by=["priority"],
        value_cols=["policy_weight"],
    )
    return joined.select(
        F.col("o_orderkey").alias("orderkey"), "policy_weight"
    ).orderBy("orderkey")


# --- salted skew join (semantics-preserving by construction) ----------

_SALTED_ORACLE = """
SELECT c.c_mktsegment AS mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY mktsegment
"""


@register("salted_join_segments", oracle=_SALTED_ORACLE)
def salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim (operators.skew.salted_join): orders spread
    over 8 subkeys per custkey, customer replicated 8× — the oracle is
    the PLAIN join aggregate, proving salting changes the shuffle
    layout, never the result. The manual fallback for single-key
    hotspots AQE's partition-splitting can't break up."""
    from ocean_data_pipeline_spark.operators.skew import salted_join

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, on="o_custkey", spread_on=F.col("o_orderkey"), n_salt=8)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("mktsegment")
    )


# --- multi-join analytics (TPC-H q3/q5 shapes) ------------------------

_SHIPPING_PRIORITY_ORACLE = """
SELECT l.l_orderkey AS orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       o.o_orderdate AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


@register("shipping_priority", oracle=_SHIPPING_PRIORITY_ORACLE)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 shape: segment-filtered customer (semi side) ⋈ orders ⋈
    lineitem, grouped revenue, top-10.

    Plan: both filters push to their scans; the filtered customer side
    broadcasts (c_mktsegment keeps 1/5 of customers); orders⋈lineitem
    shuffles on orderkey once and the groupBy reuses that partitioning
    (no second exchange); top-10 is TakeOrderedAndProject. Decimal
    revenue for partition-order invariance."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


_LOCAL_VOLUME_ORACLE = """
SELECT n.n_name AS nation,
       count(*) AS n_lineitems,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY nation
"""


@register("local_supplier_volume", oracle=_LOCAL_VOLUME_ORACLE)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 shape: six-way join where customer and supplier must
    share a nation, restricted to one region.

    Plan: region/nation/supplier/customer broadcast (true dims, each ≪
    the 64 MB threshold); orders⋈lineitem is the one fact-fact join —
    left to Catalyst, which broadcasts at test SFs and goes sort-merge
    on a cluster (bucket both on orderkey to amortize that shuffle to
    zero, tests/test_bucketing.py). The s_nationkey = c_nationkey
    colocation predicate rides the supplier broadcast join as a second
    condition."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              (li.l_suppkey == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left_semi")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("nation")
    )


# --- forward as-of: next-deadline join --------------------------------

_ASOF_FWD_ORACLE = """
WITH deadlines AS (
  SELECT o_orderpriority AS priority,
         date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS deadline,
         count(*) AS batch_size
  FROM orders GROUP BY 1, 2
  HAVING count(*) >= 45
)
SELECT o.o_orderkey AS orderkey, d.deadline, d.batch_size
FROM orders o
LEFT JOIN deadlines d
  ON d.priority = o.o_orderpriority
 AND d.deadline = (SELECT min(d2.deadline) FROM deadlines d2
                   WHERE d2.priority = o.o_orderpriority
                     AND d2.deadline >= o.o_orderdate)
ORDER BY orderkey
"""


@register("asof_forward_deadline", oracle=_ASOF_FWD_ORACLE)
def asof_forward_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators.joins.asof_join direction=
    'forward'): each order attaches the NEXT qualifying deadline — the
    end of the next busy month (>= 45 orders) for its priority class.
    Deadlines are sparse by construction, so most orders genuinely
    search several months ahead and the tail of each timeline gets
    NULL (no future deadline) — the semantics a trivially-dense right
    side would not exercise. The oracle finds the same row with a
    correlated min-subquery, the construct the union+window plan
    replaces with one running fill per group."""
    orders = table(spark, sf_dir, "orders")
    deadlines = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("batch_size"))
        .filter(F.col("batch_size") >= 45)
        .select(
            "priority",
            F.add_months(F.col("m").cast("date"), 1).cast("timestamp").alias("deadline"),
            "batch_size",
        )
    )
    left = orders.select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    joined = asof_join(
        left,
        deadlines,
        left_on="o_orderdate",
        right_on="deadline",
        by=["priority"],
        value_cols=["deadline", "batch_size"],
        direction="forward",
    )
    return joined.select(
        F.col("o_orderkey").alias("orderkey"), "deadline", "batch_size"
    ).orderBy("orderkey")


# --- nearest as-of: closest-event attribution -------------------------

_ASOF_NEAREST_ORACLE = """
WITH err AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'error'
),
pur AS (
  SELECT user_id, epoch_us(ts) AS p_us, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
cand AS (
  SELECT e.event_id, e.user_id, e.t_us,
         (SELECT max(p.p_us) FROM pur p
           WHERE p.user_id = e.user_id AND p.p_us <= e.t_us) AS b_us,
         (SELECT min(p.p_us) FROM pur p
           WHERE p.user_id = e.user_id AND p.p_us >= e.t_us) AS f_us
  FROM err e
),
chosen AS (
  SELECT event_id, user_id, t_us,
         CASE WHEN f_us IS NULL THEN b_us
              WHEN b_us IS NULL THEN f_us
              WHEN t_us - b_us <= f_us - t_us THEN b_us
              ELSE f_us END AS n_us
  FROM cand
)
SELECT c.event_id, c.user_id,
       c.n_us - c.t_us       AS offset_us,
       p.purchase_value
FROM chosen c
LEFT JOIN pur p ON p.user_id = c.user_id AND p.p_us = c.n_us
ORDER BY event_id
"""


@register("asof_nearest_event", oracle=_ASOF_NEAREST_ORACLE)
def asof_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (direction='nearest'): each error event
    attaches the same user's closest purchase in either direction,
    backward winning exact ties — "what was this user buying around
    the failure". Keys are exact integer microseconds (unix_micros) so
    the distance comparison is integer-exact on both engines; the
    right side dedups to one purchase per (user, instant) so the match
    is deterministic. The oracle needs TWO correlated extremum
    subqueries plus a tie-break — the union+window plan does it in one
    sorted exchange with two frames."""
    ev = table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us")
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_micros("ts").alias("p_us"))
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        err,
        pur,
        left_on="t_us",
        right_on="p_us",
        by=["user_id"],
        value_cols=["p_us", "purchase_value"],
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.col("p_us") - F.col("t_us")).alias("offset_us"),
        "purchase_value",
    ).orderBy("event_id")


# --- runtime Bloom-filter join (join-bloom): the 100 TB
# shuffle-reduction lever, registered so the driver exercises it. ------

_BLOOM_ORACLE = """
SELECT
  l_returnflag                                               AS returnflag,
  count(*)                                                   AS n_items,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
ORDER BY returnflag
"""

#: Optimizer confs the bloom posture needs at PLAN time. Applied to an
#: isolated `spark.newSession()` (shared SparkContext, private SQLConf)
#: so they are live when the driver finally acts on the returned
#: DataFrame, without leaking into sibling queries' plans:
#: the scan-size floor is for production (10 GB default) and must drop
#: to 0 at test scale, and broadcast must be off for THIS join because
#: runtime bloom filters target shuffle joins — neither belongs in the
#: shared session.
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@register("bloom_join_urgent_revenue", oracle=_BLOOM_ORACLE)
def bloom_join_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim ⋈ fact with a runtime Bloom filter: the optimizer
    turns the `o_orderpriority = '1-URGENT'` predicate into a
    `might_contain(bloom_filter_agg(xxhash64(o_orderkey)))` semi-filter
    INJECTED ON THE FACT SCAN, so ~80% of lineitem rows are dropped
    before the join shuffle instead of after it — at 100 TB that is the
    difference between shuffling the fact table and shuffling a fifth
    of it. Plan-gated (tools/explain_audit.py) and snapshot-pinned;
    results are identical with the filter on or off
    (tests/test_bloom_join.py).

    Built on an isolated `newSession()` so the plan-time confs
    (_BLOOM_CONFS) are in force whenever the caller executes the
    returned DataFrame, while the caller's own session confs stay
    untouched.
    """
    from ocean_data_pipeline_spark.session import tune_for_oracle

    sub = tune_for_oracle(spark.newSession())
    for k, v in _BLOOM_CONFS.items():
        sub.conf.set(k, v)
    li = table(sub, sf_dir, "lineitem")
    orders = table(sub, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("returnflag")
    )


# --- fuzzy (edit-distance) self-match ---------------------------------

_FUZZY_ORACLE = """
WITH names AS (
  SELECT p_name AS name, count(*) AS n_parts
  FROM part GROUP BY p_name
)
SELECT a.name AS name_a,
       b.name AS name_b,
       levenshtein(a.name, b.name) AS edit_dist,
       a.n_parts AS n_parts_a,
       b.n_parts AS n_parts_b
FROM names a
JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
ORDER BY edit_dist, name_a, name_b
"""


@register("fuzzy_name_pairs", oracle=_FUZZY_ORACLE)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: part-name pairs within Levenshtein
    distance 3 — the catalog-reconciliation / typo-cluster op, with
    occurrence counts so downstream merging knows which spelling
    dominates. Edit distance is integer-exact, so the oracle needs no
    rounding discipline at all.

    Plan shape: the match runs on the DISTINCT-name relation
    (vocabulary scale — here ~10² names for 2·10³ parts), never on the
    base table; at 100 TB add a (length-band, first-char) blocking key
    to the self-join so candidate pairs stay near-linear, exactly like
    the MinHash banding used for documents. The θ-condition
    (name <, levenshtein ≤) plans as a broadcast nested-loop over the
    tiny name relation."""
    p = table(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    a = names.select(F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a"))
    b = names.select(F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
        .orderBy("edit_dist", "name_a", "name_b")
    )


# --- full outer join: nation presence reconciliation -------------------

_FULL_OUTER_ORACLE = """
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers
  FROM customer GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
  FROM supplier GROUP BY 1
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(c.n_customers, 0) AS n_customers,
       coalesce(s.n_suppliers, 0) AS n_suppliers,
       CASE WHEN c.nationkey IS NOT NULL AND s.nationkey IS NOT NULL
              THEN 'both'
            WHEN c.nationkey IS NOT NULL THEN 'customers_only'
            ELSE 'suppliers_only' END AS presence
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
ORDER BY nationkey
"""


@register("full_outer_nation_presence", oracle=_FULL_OUTER_ORACLE)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch FULL OUTER equi-join (completes the §2-C join-type grid
    whose streaming twin is `stream_join_funnel_outer`): per-nation
    customer counts reconciled against per-nation supplier counts,
    keeping nations present on EITHER side and classifying each as
    both / customers_only / suppliers_only — the reconciliation shape
    of every two-source data audit.

    Plan shape: both inputs are first reduced to per-key partials
    (O(nations) rows), so the full-outer join — which cannot broadcast
    (both sides must keep unmatched rows) — shuffles only the tiny
    aggregated relations; the fact tables are touched once each by the
    counting aggs. SortMergeJoin FullOuter on the key is the expected
    physical plan at any scale."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    ca, sa = c.alias("c"), s.alias("s")
    return (
        ca.join(sa, F.col("c.nationkey") == F.col("s.nationkey"), "full_outer")
        .select(
            F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
            F.coalesce(F.col("c.n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("s.n_suppliers"), F.lit(0)).alias("n_suppliers"),
            F.when(
                F.col("c.nationkey").isNotNull() & F.col("s.nationkey").isNotNull(),
                "both",
            )
            .when(F.col("c.nationkey").isNotNull(), "customers_only")
            .otherwise("suppliers_only")
            .alias("presence"),
        )
        .orderBy("nationkey")
    )
