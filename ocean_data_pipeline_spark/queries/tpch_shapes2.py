"""Second batch of TPC-H-shape relational queries (SURVEY.md §2-C/D
capability classes): per-group argmin join-back (q2), distinct-count
with NOT-IN exclusion (q16), disjunctive join predicate (q19),
multi-EXISTS self-join (q21), and substring-grouped anti-join with a
scalar threshold (q22). The testdata has no partsupp table, so the
q2/q16 shapes derive supplier-part economics from lineitem — the plan
families (argmin window + join-back, anti-join + countDistinct,
OR-of-conjunctions residual, double semi/anti self-join, scalar
broadcast threshold) are what's being exercised, at the same
cardinality posture TPC-H gives them.

Reference parity: the reference has no relational joins at all
(SURVEY.md §2-C, cache_manager.py:90-117 is its only lookup); these
are capability-class completions for the star-schema surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# --- q2 shape: per-group argmin with join-back ------------------------

_MIN_COST_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost, l_suppkey) AS rn
  FROM cost
)
SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name AS supp_nation,
       CAST(ROUND(CAST(r.unit_cost AS DECIMAL(38,10)), 4) AS DOUBLE) AS unit_cost
FROM ranked r
JOIN part p     ON p.p_partkey = r.l_partkey
JOIN supplier s ON s.s_suppkey = r.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE r.rn = 1 AND p.p_size <= 3
ORDER BY p.p_partkey
"""


@register("min_cost_supplier", oracle=_MIN_COST_ORACLE)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: for each (small) part, the supplier offering the
    lowest observed unit price, enriched with supplier identity and
    nation. The correlated `= (SELECT min(...))` of TPC-H q2 is
    written as its decorrelated argmin: aggregate once per
    (part, supplier), then a row_number window per part picks the
    winner (suppkey tie-break makes the answer total). At scale the
    window runs on the already-aggregated (part, supplier) relation —
    ~|parts|×|suppliers-per-part| rows, not the fact table — and the
    three enrichment joins all broadcast (dims are small); the only
    big shuffle is the first groupBy on the fact.

    Reference parity: capability-class completion (SURVEY.md §2-C
    join-inner row); the reference's nearest analog is argmin-by-
    distance cache lookup, cache_manager.py:302-311."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy(F.asc("unit_cost"), F.asc("l_suppkey"))
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            # double-round via a decimal(38,10) waypoint: Spark rounds
            # the exact binary value, DuckDB rounds the shortest
            # decimal repr — a raw double like 508.87924999999996
            # ("…925" printed) splits them at 4dp; the 10dp decimal
            # cast lands both on the same exact decimal first
            F.round(F.col("unit_cost").cast("decimal(38,10)"), 4)
            .cast("double")
            .alias("unit_cost"),
        )
        .orderBy("p_partkey")
    )


# --- q16 shape: supplier diversity with NOT-IN exclusion --------------

_SUPPLIER_CNT_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("supplier_cnt_by_part", oracle=_SUPPLIER_CNT_ORACLE)
def supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: how many distinct suppliers ship each surviving
    (brand, type, size) part class, excluding blacklisted suppliers.
    The NOT IN subquery is a LEFT ANTI join (the exclusion set is tiny
    → broadcast anti); part filters prune before the fact join; the
    countDistinct plans as a two-phase partial/final distinct
    aggregate, so the shuffle carries (grp, suppkey) pairs already
    deduplicated map-side — the posture that keeps q16 cheap at
    100 TB.

    Reference parity: capability class (SURVEY.md §2-C join-anti,
    §2-D agg-groupby distinct)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- q19 shape: disjunctive join predicate ----------------------------

_DISJUNCT_ORACLE = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 35)
"""


@register("disjunctive_promo_revenue", oracle=_DISJUNCT_ORACLE)
def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 shape: revenue under an OR of brand/size/quantity conjunct
    bundles — the classic disjunctive join predicate. Catalyst
    extracts the common sub-predicates per side (size ≤ 15 reaches the
    part scan, quantity ≤ 35 the lineitem scan) so both inputs shrink
    BEFORE the join; the full disjunction evaluates as the join
    residual. Part is broadcast; the fact is never shuffled.

    Reference parity: capability class (SURVEY.md §2-B pred-range
    generalized to multi-clause disjunction)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bundle = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 25)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 35)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return j.filter(bundle).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- q21 shape: EXISTS + NOT EXISTS self-joins on the fact ------------

_SOLE_LATE_ORACLE = """
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late) late
JOIN supplier s ON s.s_suppkey = late.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lines o2
    WHERE o2.l_orderkey = late.l_orderkey AND o2.l_suppkey <> late.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lines o3
    WHERE o3.l_orderkey = late.l_orderkey AND o3.l_suppkey <> late.l_suppkey
      AND o3.is_late
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("sole_late_supplier", oracle=_SOLE_LATE_ORACLE)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finished order. Two correlated quantifiers over the
    same fact — EXISTS (another supplier in the order) and NOT EXISTS
    (another LATE supplier) — become one LEFT SEMI and one LEFT ANTI
    self-join, each on the order key with the supplier-inequality as
    residual. The shared `lines` relation is computed once; all three
    passes shuffle on l_orderkey, so under one partitioning the semi
    and anti joins co-locate with no extra exchange (the testdata has
    no receipt/commit dates, so "late" = shipped > 60 days after
    order — same plan family as TPC-H q21's l_receiptdate >
    l_commitdate).

    Reference parity: capability class (SURVEY.md §2-C join-semi +
    join-anti composed)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "is_late"
        ),
    )
    late = lines.filter("is_late").select("l_orderkey", "l_suppkey").distinct()
    others = lines.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = lines.filter("is_late").select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole = (
        late.join(
            others,
            (late.l_orderkey == others.o2_orderkey)
            & (late.l_suppkey != others.o2_suppkey),
            "left_semi",
        )
        .join(
            late_others,
            (late.l_orderkey == late_others.o3_orderkey)
            & (late.l_suppkey != late_others.o3_suppkey),
            "left_anti",
        )
    )
    supplier = table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(supplier), sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# --- q22 shape: substring grouping + scalar threshold + anti-join -----

_IDLE_BALANCE_ORACLE = """
WITH thresh AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT substring(c.c_name, 16, 2) AS cust_code,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND substring(c.c_name, 16, 2) IN ('00', '11', '22', '33', '44')
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY cust_code
ORDER BY cust_code
"""


@register("idle_customer_balance", oracle=_IDLE_BALANCE_ORACLE)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: well-funded customers (balance above the positive-
    balance average) who never placed an URGENT order, bucketed by a
    substring code of their name (last two digits — TPC-H's phone
    country code analog). Three plan pieces: a 1-row scalar aggregate
    cross-joined (broadcast) as the threshold; a LEFT ANTI join
    against filtered orders for NOT EXISTS; substring grouping. The
    threshold uses a decimal sum / count so both engines compute the
    identical boundary (float partial sums are order-dependent). At
    scale the anti join shuffles customer vs orders on custkey — the
    one real exchange; everything else is map-side.

    Reference parity: capability class (SURVEY.md §2-C join-anti,
    §2-F fn-str-normalize substring)."""
    cust = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    code = F.substring("c_name", 16, 2)
    return (
        cust.filter(code.isin("00", "11", "22", "33", "44"))
        .join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(code.alias("cust_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias(
                "totacctbal"
            ),
        )
        .orderBy("cust_code")
    )


# --- q15 shape: aggregate joined to its own max -----------------------

_TOP_SUPPLIER_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_rev AS DOUBLE) AS total_rev
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s.s_suppkey
"""


@register("top_revenue_supplier", oracle=_TOP_SUPPLIER_ORACLE)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: the supplier(s) with maximum revenue in one quarter
    — an aggregate compared against the max OF THE SAME aggregate
    (TPC-H's revenue view used twice). The quarterly aggregate is
    computed once and self-joined to its 1-row max via a broadcast
    cross join; revenue stays DECIMAL through both the aggregate and
    the equality (exact — a float sum would make `= max` partial-
    order-dependent) and casts to double only for display. Returns all
    tied suppliers, like the spec."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supplier = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
        .orderBy("s_suppkey")
    )


# --- q11 shape: group share against a global-total threshold ----------

_VALUE_SHARE_ORACLE = """
WITH pv AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_1'
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(part_value AS DOUBLE) AS part_value
FROM pv
WHERE part_value > (SELECT sum(part_value) * 0.001 FROM pv)
ORDER BY part_value DESC, p_partkey
"""


@register("nation_value_share", oracle=_VALUE_SHARE_ORACLE)
def nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: parts representing a non-trivial share of one
    nation's shipped value — a grouped aggregate filtered against a
    scalar derived from its own global total. The per-part aggregate
    is computed once; the 1-row total broadcasts back over it (scalar
    subquery → broadcast nested-loop of a single row, not a shuffle).
    DECIMAL through sum and threshold so the share boundary is exact
    on both engines."""
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    pv = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("part_value"))
    )
    thresh = pv.agg((F.sum("part_value") * F.lit(0.001)).alias("cutoff"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )
