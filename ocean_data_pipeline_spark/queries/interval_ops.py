"""Interval / range-join queries (SURVEY.md §2-C width): temporal
overlap detection and windowed rollups — the join shapes that have no
native equi key and therefore need deliberate scale treatment (a naive
theta join is a cartesian product at 100 TB).

Two scale postures demonstrated:
- `shipment_overlap_pairs`: the interval predicate rides on an
  existing equi key (same order), so the theta part only runs inside
  key groups whose fanout is bounded by order size (<= ~13 lines).
- `fiscal_window_rollup`: no natural equi key — the classic fix is to
  EXPLODE each row into the coarse bins its interval covers and
  equi-join on the bin (Databricks' range-join optimization, DuckDB's
  IEJoin paper's bucketed baseline). Explode factor = interval span /
  bin width (here 3), so the join is linear, never quadratic, and the
  small-data oracle can afford the direct theta join the engine
  refuses to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# --- same-order shipment overlap pairs --------------------------------

_OVERLAP_ORACLE = """
WITH pairs AS (
  SELECT a.l_orderkey,
         abs(datediff('day', a.l_shipdate, b.l_shipdate)) AS gap_days
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
  WHERE abs(datediff('day', a.l_shipdate, b.l_shipdate)) <= 7
)
SELECT count(*) AS n_pairs,
       count(DISTINCT l_orderkey) AS n_orders_with_overlap,
       CASE WHEN count(*) > 0
            THEN round(CAST(sum(gap_days) AS DOUBLE) / count(*), 4)
       END AS avg_gap_days
FROM pairs
"""


@register("shipment_overlap_pairs", oracle=_OVERLAP_ORACLE)
def shipment_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal overlap join within a key group: pairs of lineitems in
    the SAME order whose 8-day handling windows [shipdate, shipdate+7d]
    overlap (|delta-days| <= 7) — the co-shipment consolidation signal.
    The census reports pair count, orders affected, and mean gap.

    Plan shape: a self equi-join on l_orderkey (shuffle on the key,
    never a cartesian product) with the interval predicate and the
    linenumber de-dup ordering as residual filters; per-key fanout is
    C(order size, 2) <= C(13,2), so the pair relation is linear in
    orders. The final census is a single 1-row aggregate.

    Pair identity: (orderkey, linenumber) is NOT unique in the
    testdata, so pairing is by STRICT linenumber inequality — two rows
    sharing a linenumber never form a pair (they are duplicate
    manifests of the same line, not two shipments)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln_a"),
        F.col("l_shipdate").alias("ship_a"),
    )
    b = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln_b"),
        F.col("l_shipdate").alias("ship_b"),
    )
    pairs = (
        a.join(b, "k")
        .filter(F.col("ln_a") < F.col("ln_b"))
        .select(
            F.col("k").alias("l_orderkey"),
            F.abs(F.datediff("ship_b", "ship_a")).alias("gap_days"),
        )
        .filter(F.col("gap_days") <= 7)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("l_orderkey").alias("n_orders_with_overlap"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(F.sum("gap_days").cast("double") / F.count(F.lit(1)), 4),
        ).alias("avg_gap_days"),
    )


# --- binned range join: overlapping fiscal windows --------------------

_FISCAL_ORACLE = """
WITH m AS (
  SELECT date_trunc('month', l_shipdate) AS mon,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev,
         count(*) AS n
  FROM lineitem GROUP BY 1
),
w AS (SELECT DISTINCT mon AS w0 FROM m)
SELECT strftime(w.w0, '%Y-%m-%d') AS window_start,
       count(*) AS n_months,
       CAST(sum(m.n) AS BIGINT) AS n_rows,
       CAST(round(sum(m.rev), 2) AS DOUBLE) AS window_rev
FROM w JOIN m
  ON m.mon >= w.w0 AND m.mon < w.w0 + INTERVAL 3 MONTH
GROUP BY w.w0 ORDER BY window_start
"""


@register("fiscal_window_rollup", oracle=_FISCAL_ORACLE)
def fiscal_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window rollup via a BINNED range join: revenue over
    every 3-month fiscal window anchored at each month with data. Each
    month belongs to 3 windows, so this is an interval containment join
    (month in [w0, w0+3mo)) with NO equi key.

    Scale posture: the engine side never runs the theta join. The fact
    table is first reduced to per-month partials (O(months) rows), each
    month row is EXPLODED into the exactly-3 window anchors that could
    contain it ({m, m-1mo, m-2mo}), and an equi-join against the
    anchor set keeps the windows that exist. Work is 3x months — at
    100 TB the pre-aggregation means the range logic touches thousands
    of rows, not trillions; the theta join survives only in the DuckDB
    oracle, which proves the rewrite exact.

    Plan shape: one partial agg onto months -> generator (explode) ->
    equi-join (broadcast-able anchor list) -> final agg on anchors."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    m = li.groupBy(
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("mon")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    anchors = m.select(F.col("mon").alias("w0")).distinct()
    cand = m.select(
        F.explode(
            F.array(
                F.col("mon"),
                F.add_months("mon", -1),
                F.add_months("mon", -2),
            )
        ).alias("w0"),
        "rev",
        "n",
    )
    return (
        cand.join(anchors, "w0")
        .groupBy("w0")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.sum("n").alias("n_rows"),
            # round in DECIMAL, then cast: rounding after the double
            # cast put the .985 half-way case on different sides of
            # the boundary per engine at sf0.1's ~1e9 window mass
            F.round(F.sum("rev"), 2).cast("double").alias("window_rev"),
        )
        .select(
            F.date_format("w0", "yyyy-MM-dd").alias("window_start"),
            "n_months",
            "n_rows",
            "window_rev",
        )
        .orderBy("window_start")
    )


# --- interval-union coverage ------------------------------------------

_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT o_custkey,
         o_orderkey,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS e
  FROM orders
),
flagged AS (
  SELECT o_custkey, o_orderkey, s, e,
         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT o_custkey, s, e,
         sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
),
merged AS (
  SELECT o_custkey, island,
         count(*) AS n_orders,
         date_diff('day', min(s), CAST(max(e) AS DATE)) AS covered
  FROM islands GROUP BY o_custkey, island
)
SELECT o_custkey,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       count(*) AS n_islands,
       CAST(sum(covered) AS BIGINT) AS covered_days
FROM merged
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("interval_coverage_days", oracle=_COVERAGE_ORACLE)
def interval_coverage_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage (merge overlapping intervals): each
    order opens a 7-day handling window; per customer, overlapping
    windows merge into islands and the total COVERED days are summed
    — the utilization/dwell-time shape (machine uptime, user active
    time, SLA coverage) that naive duration sums double-count.

    The merge is the gaps-and-islands device: a running max-end over
    the (start, orderkey)-ordered per-customer partition flags island
    starts, a running sum labels islands, two keyed aggregates finish.
    All three windows and both aggregates share ONE custkey exchange;
    dates stay exact integers end to end."""
    iv = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("e"),
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "o_orderkey")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.select(
        "o_custkey",
        "o_orderkey",
        "s",
        "e",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.datediff(F.max("e"), F.min("s")).alias("covered"),
    )
    return (
        merged.groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("covered").cast("bigint").alias("covered_days"),
        )
        .orderBy("o_custkey")
    )


# --- FIFO lot allocation (cumulative-interval matching) -----------------

_FIFO_ORACLE = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS qty,
         l_shipdate,
         l_orderkey % 2 = 0 AS is_supply
  FROM lineitem
),
supply AS (
  SELECT l_partkey, qty,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber, qty
                        ROWS UNBOUNDED PRECEDING) AS s_end
  FROM li WHERE is_supply
),
demand AS (
  SELECT l_partkey, qty,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber, qty
                        ROWS UNBOUNDED PRECEDING) AS d_end
  FROM li WHERE NOT is_supply
),
alloc AS (
  SELECT s.l_partkey,
         least(s.s_end, d.d_end)
           - greatest(s.s_end - s.qty, d.d_end - d.qty) AS a
  FROM supply s
  JOIN demand d ON d.l_partkey = s.l_partkey
  WHERE least(s.s_end, d.d_end)
        > greatest(s.s_end - s.qty, d.d_end - d.qty)
),
tot AS (
  SELECT p.l_partkey,
         coalesce(sq.supply_qty, 0) AS supply_qty,
         coalesce(dq.demand_qty, 0) AS demand_qty,
         coalesce(a.n_allocations, 0) AS n_allocations,
         coalesce(a.allocated_qty, 0) AS allocated_qty
  FROM (SELECT DISTINCT l_partkey FROM li) p
  LEFT JOIN (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS supply_qty
             FROM li WHERE is_supply GROUP BY 1) sq ON sq.l_partkey = p.l_partkey
  LEFT JOIN (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS demand_qty
             FROM li WHERE NOT is_supply GROUP BY 1) dq ON dq.l_partkey = p.l_partkey
  LEFT JOIN (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_allocations,
                    CAST(sum(a) AS BIGINT) AS allocated_qty
             FROM alloc GROUP BY 1) a ON a.l_partkey = p.l_partkey
)
SELECT l_partkey AS partkey, n_allocations, allocated_qty,
       supply_qty, demand_qty,
       demand_qty - allocated_qty AS unmet_demand,
       supply_qty - allocated_qty AS leftover_supply
FROM tot
ORDER BY partkey
"""


@register("fifo_lot_allocation", oracle=_FIFO_ORACLE)
def fifo_lot_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO inventory allocation: per part, supply lots (even order
    keys) are consumed by demand rows (odd order keys) in ship-date
    order, and each (lot, demand) allocation is the OVERLAP of their
    cumulative-quantity intervals — the prefix-sum formulation that
    turns an inherently sequential matching loop into two windows plus
    one bounded equi-join (pairs per part are bounded by rows per
    part, ~15×15 here; interval overlap prunes to the matched band).
    The classic FIFO-costing/fulfillment op; allocation = min(ends) -
    max(starts), all BIGINT-exact. Totality: parts with one side empty
    report zero allocations via the left-join spine."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_shipdate",
        (F.col("l_orderkey") % 2 == 0).alias("is_supply"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    supply = (
        li.where("is_supply")
        .select("l_partkey", "qty", F.sum("qty").over(w).alias("s_end"))
    )
    demand = (
        li.where("NOT is_supply")
        .select("l_partkey", "qty", F.sum("qty").over(w).alias("d_end"))
    )
    s = supply.select(
        "l_partkey",
        (F.col("s_end") - F.col("qty")).alias("s_start"),
        F.col("s_end"),
    )
    d = demand.select(
        F.col("l_partkey").alias("pk_d"),
        (F.col("d_end") - F.col("qty")).alias("d_start"),
        F.col("d_end"),
    )
    alloc = (
        s.join(d, s.l_partkey == d.pk_d)
        .where(
            F.least("s_end", "d_end") > F.greatest("s_start", "d_start")
        )
        .select(
            "l_partkey",
            (
                F.least("s_end", "d_end") - F.greatest("s_start", "d_start")
            ).alias("a"),
        )
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_allocations"),
            F.sum("a").cast("bigint").alias("allocated_qty"),
        )
    )
    sq = (
        li.where("is_supply")
        .groupBy("l_partkey")
        .agg(F.sum("qty").cast("bigint").alias("supply_qty"))
    )
    dq = (
        li.where("NOT is_supply")
        .groupBy("l_partkey")
        .agg(F.sum("qty").cast("bigint").alias("demand_qty"))
    )
    spine = li.select("l_partkey").distinct()
    tot = (
        spine.join(sq, "l_partkey", "left")
        .join(dq, "l_partkey", "left")
        .join(alloc, "l_partkey", "left")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.coalesce("n_allocations", F.lit(0)).cast("bigint").alias("n_allocations"),
            F.coalesce("allocated_qty", F.lit(0)).cast("bigint").alias("allocated_qty"),
            F.coalesce("supply_qty", F.lit(0)).cast("bigint").alias("supply_qty"),
            F.coalesce("demand_qty", F.lit(0)).cast("bigint").alias("demand_qty"),
        )
    )
    return tot.select(
        "partkey",
        "n_allocations",
        "allocated_qty",
        "supply_qty",
        "demand_qty",
        (F.col("demand_qty") - F.col("allocated_qty")).alias("unmet_demand"),
        (F.col("supply_qty") - F.col("allocated_qty")).alias("leftover_supply"),
    ).orderBy("partkey")
