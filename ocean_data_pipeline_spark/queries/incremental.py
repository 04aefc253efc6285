"""Incremental-computation queries (SURVEY.md §2-D/J width): algebraic
partial-aggregate merge, incremental materialized-view refresh, and
SCD2 change history — the shapes a 100 TB pipeline uses to avoid
recomputing the world on every batch.

Why these are first-class at scale: a daily-ingest corpus cannot
re-aggregate 100 TB per day. The mergeable-state discipline (count/
sum/min/max partials that combine associatively, exactly the contract
of Spark's own partial_* physical aggregates) is what makes per-batch
cost proportional to the BATCH, not the corpus. The oracles recompute
from scratch, so a green row proves merge == recompute.

Determinism: all money math in DECIMAL(18,2) partials (exact,
order-independent), doubles only at the final division, rounded on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

_CUTOFF = "1998-01-01"

# --- algebraic partial-aggregate merge --------------------------------

_MERGE_ORACLE = """
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-01') AS ship_month,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 2) AS avg_price,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem
GROUP BY 1 ORDER BY ship_month
"""


@register("incremental_agg_merge", oracle=_MERGE_ORACLE)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic partial-aggregate merge: the fact table is split at a
    batch boundary (shipdate < 1998-01-01 vs >=), each half is reduced
    to per-month mergeable states (count, decimal sums, min, max), and
    the states are merged with a second aggregate — sum-of-counts,
    sum-of-sums, min-of-mins, max-of-maxes — with the mean derived only
    AFTER the merge (mean itself is not mergeable; its sufficient
    statistics are). The oracle aggregates the unsplit table, so the
    green row is a proof of merge == recompute — the invariant every
    incremental 100 TB rollup rests on.

    Plan shape: two disjoint filtered scans (the split predicate is
    pushed to parquet) -> two partial aggs onto month keys -> a union
    of ~2x months rows -> one merge agg on month. The merge stage's
    input is O(months), not O(rows)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-01").alias(
                "ship_month"
            )
        ).agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("p_sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p_sum_price"),
            F.min("l_extendedprice").alias("p_min"),
            F.max("l_extendedprice").alias("p_max"),
        )

    cutoff = F.lit(_CUTOFF).cast("timestamp")
    states = partial(li.filter(F.col("l_shipdate") < cutoff)).unionByName(
        partial(li.filter(F.col("l_shipdate") >= cutoff))
    )
    return (
        states.groupBy("ship_month")
        .agg(
            F.sum("p_n").alias("n_rows"),
            F.sum("p_sum_qty").alias("sum_qty"),
            F.sum("p_sum_price").alias("sum_price"),
            F.min("p_min").alias("min_price"),
            F.max("p_max").alias("max_price"),
        )
        .select(
            "ship_month",
            "n_rows",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.round(F.col("sum_price").cast("double") / F.col("n_rows"), 2).alias(
                "avg_price"
            ),
            "min_price",
            "max_price",
        )
        .orderBy("ship_month")
    )


# --- incremental materialized-view refresh ----------------------------

_MV_CUTOFF = "2000-01-01"

_MV_ORACLE = f"""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-01') AS order_month,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       max(CASE WHEN o_orderdate >= TIMESTAMP '{_MV_CUTOFF}'
                THEN 1 ELSE 0 END) = 1 AS refreshed
FROM orders
GROUP BY 1 ORDER BY order_month
"""


@register("mv_incremental_refresh", oracle=_MV_ORACLE)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: a monthly-revenue MV was
    built on the pre-cutoff corpus; a delta batch (orders on/after
    2000-01-01) arrives, is reduced to partial states, and is MERGED
    into the stored MV — only months the delta touches change, flagged
    `refreshed`. The oracle rebuilds the MV from the full table, so the
    green row proves delta-merge == full recompute including the
    touched-month flags.

    Plan shape: identical to `incremental_agg_merge` but framed as MV
    maintenance: the per-batch cost is O(delta) + O(touched months);
    the untouched MV rows pass through the merge agg unchanged. At
    100 TB the stored MV is a parquet/Delta table and the merge is a
    MERGE INTO keyed on month — semantics identical to this union-agg
    formulation."""
    o = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")

    def partial(df: DataFrame, refreshed: bool) -> DataFrame:
        return df.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-01").alias(
                "order_month"
            )
        ).agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("p_rev"),
            F.lit(1 if refreshed else 0).alias("p_refreshed"),
        )

    mv = partial(o.filter(F.col("o_orderdate") < cutoff), refreshed=False)
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff), refreshed=True)
    return (
        mv.unionByName(delta)
        .groupBy("order_month")
        .agg(
            F.sum("p_n").alias("n_orders"),
            F.sum("p_rev").cast("double").alias("revenue"),
            (F.max("p_refreshed") == 1).alias("refreshed"),
        )
        .orderBy("order_month")
    )


# --- SCD2 change history ----------------------------------------------

_SCD2_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         CASE WHEN lag(o_orderpriority) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ) IS NULL
              OR lag(o_orderpriority) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ) <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
),
islands AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         sum(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM seq
),
hist AS (
  SELECT o_custkey, o_orderpriority AS priority, island,
         min(o_orderdate) AS vf, count(*) AS n_orders
  FROM islands GROUP BY o_custkey, o_orderpriority, island
)
SELECT o_custkey, priority,
       strftime(vf, '%Y-%m-%d') AS valid_from,
       strftime(lead(vf) OVER (PARTITION BY o_custkey ORDER BY island),
                '%Y-%m-%d') AS valid_to,
       n_orders,
       lead(vf) OVER (PARTITION BY o_custkey ORDER BY island) IS NULL
         AS is_current
FROM hist
ORDER BY o_custkey, island
"""


@register("scd2_priority_history", oracle=_SCD2_ORACLE)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) history: each customer's
    order-priority timeline is compressed into validity intervals —
    maximal runs of the same priority (gaps-and-islands over the
    (orderdate, orderkey)-ordered stream) become [valid_from, valid_to)
    rows with the open interval flagged `is_current`. This is the
    standard warehouse pattern for tracking attribute changes through a
    CDC feed without overwriting history.

    Plan shape: the change-flag lag window, the running-sum island
    window, and the interval lead window all partition on o_custkey —
    ONE exchange serves all three (the middle agg is also custkey-
    keyed). Linear in orders; output is O(change points)."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn(
        "chg",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
            1,
        ).otherwise(0),
    )
    islands = seq.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    hist = islands.groupBy(
        "o_custkey", F.col("o_orderpriority").alias("priority"), "island"
    ).agg(F.min("o_orderdate").alias("vf"), F.count(F.lit(1)).alias("n_orders"))
    w_iv = Window.partitionBy("o_custkey").orderBy("island")
    return hist.select(
        "o_custkey",
        "priority",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("vf").over(w_iv), "yyyy-MM-dd").alias("valid_to"),
        "n_orders",
        F.lead("vf").over(w_iv).isNull().alias("is_current"),
        "island",
    ).orderBy("o_custkey", "island").drop("island")


# --- SCD2 point-in-time (temporal as-of) join -------------------------

_PIT_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         CASE WHEN lag(o_orderpriority) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ) IS NULL
              OR lag(o_orderpriority) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ) <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
),
islands AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         sum(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM seq
),
hist AS (
  SELECT o_custkey, o_orderpriority AS priority, island,
         min(o_orderdate) AS vf
  FROM islands GROUP BY o_custkey, o_orderpriority, island
),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         o_orderdate + INTERVAL 90 DAY AS review_ts
  FROM orders
),
matched AS (
  SELECT p.o_orderkey, p.o_orderpriority AS priority_at_order,
         h.priority AS priority_at_review,
         row_number() OVER (PARTITION BY p.o_orderkey
                            ORDER BY h.vf DESC, h.island DESC) AS rn
  FROM probe p JOIN hist h
    ON h.o_custkey = p.o_custkey AND h.vf <= p.review_ts
)
SELECT priority_at_order, priority_at_review,
       count(*) AS n_orders
FROM matched WHERE rn = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("scd2_point_in_time_join", oracle=_PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal as-of) join against the SCD2 history:
    each order probes the priority interval ACTIVE 90 days after it was
    placed — the warehouse question "which dimension version governed
    this fact at time t". The result is the priority drift matrix
    (priority at order time x priority in force at review time); the
    diagonal is regime stability.

    As-of semantics: with contiguous [valid_from, valid_to) intervals,
    the active version is the one with the LARGEST valid_from <=
    probe-time — an equi-join on the customer key with a backward-
    looking residual, deduplicated per probe by row_number over
    (valid_from DESC, island DESC); the island tie-break makes
    same-day regime flips deterministic on both engines.

    Plan shape: the history build is `scd2_priority_history`'s
    one-exchange window stack; the probe join shuffles on o_custkey
    (co-partitioned with the history), per-probe fanout is the
    customer's interval count (~orders per customer), and the dedup
    window partitions on the unique o_orderkey. Output is the tiny
    priority x priority matrix."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn(
        "chg",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
            1,
        ).otherwise(0),
    )
    islands = seq.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    hist = islands.groupBy(
        "o_custkey", F.col("o_orderpriority").alias("priority"), "island"
    ).agg(F.min("o_orderdate").alias("vf"))
    probe = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderpriority").alias("priority_at_order"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("review_ts"),
    )
    w_dedup = Window.partitionBy("o_orderkey").orderBy(
        F.desc("vf"), F.desc("island")
    )
    matched = (
        probe.join(hist, "o_custkey")
        .filter(F.col("vf") <= F.col("review_ts"))
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
    )
    return (
        matched.groupBy(
            "priority_at_order", F.col("priority").alias("priority_at_review")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority_at_order", "priority_at_review")
    )


# --- snapshot diff (table reconciliation) ------------------------------

_DIFF_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
),
v2 AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 89 <> 0
),
d AS (
  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
              WHEN b.o_orderkey IS NULL THEN 'deleted'
              WHEN a.o_totalprice <> b.o_totalprice
                OR a.o_orderpriority <> b.o_orderpriority THEN 'updated'
              ELSE 'unchanged' END AS status
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
)
SELECT status, count(*) AS n_rows
FROM d GROUP BY status ORDER BY status
"""


@register("snapshot_diff_census", oracle=_DIFF_ORACLE)
def snapshot_diff_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff): two versions of the orders
    table — v2 drops some keys (deleted), contains keys v1 lacks
    (inserted), and bumps some prices (updated) — are compared into the
    inserted/deleted/updated/unchanged census every data-migration
    sign-off runs. The versions are derived deterministically in-query
    (modulo rules on the key; the 10% price bump is the same IEEE
    multiply on both engines, so the inequality compare is exact).

    Plan shape: FULL OUTER join on the snapshot key (the canonical
    diff; neither side can broadcast because unmatched rows must
    survive both ways), column comparison as a projection, then a
    4-row census agg. At 100 TB the same shape runs bucket-by-bucket
    over co-partitioned snapshots, or reads a Delta/Iceberg change
    feed instead of diffing — this query is the from-scratch fallback
    that needs no table format support."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    v1 = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderpriority").alias("pri1"),
        F.col("o_totalprice").alias("price1"),
    )
    v2 = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderpriority").alias("pri2"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("price2"),
    )
    d = v1.join(v2, F.col("k1") == F.col("k2"), "full_outer").select(
        F.when(F.col("k1").isNull(), "inserted")
        .when(F.col("k2").isNull(), "deleted")
        .when(
            (F.col("price1") != F.col("price2"))
            | (F.col("pri1") != F.col("pri2")),
            "updated",
        )
        .otherwise("unchanged")
        .alias("status")
    )
    return (
        d.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


# --- CDC change-log apply (upserts + deletes) --------------------------

_CDC_ORACLE = """
WITH log AS (
  SELECT o_orderkey % 5000 AS key,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST(o_totalprice AS DECIMAL(18,2)) AS payload
  FROM orders
),
latest AS (
  SELECT key, seq, op, payload,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM log
),
final AS (
  SELECT key, op, payload FROM latest WHERE rn = 1
)
SELECT (SELECT count(*) FROM log)                                  AS n_ops,
       (SELECT count(*) FROM log WHERE op = 'U')                   AS n_upserts,
       (SELECT count(*) FROM log WHERE op = 'D')                   AS n_deletes,
       CAST(count(CASE WHEN op = 'U' THEN 1 END) AS BIGINT)        AS n_live_keys,
       CAST(count(CASE WHEN op = 'D' THEN 1 END) AS BIGINT)        AS n_tombstones,
       CAST(sum(CASE WHEN op = 'U' THEN payload
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS live_value_total
FROM final
"""


@register("cdc_apply_changes", oracle=_CDC_ORACLE)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log replay with last-writer-wins AND delete semantics — the
    APPLY CHANGES / MERGE-from-changefeed shape: an ordered stream of
    (key, seq, op∈{U,D}, payload) collapses to each key's latest op;
    keys whose final op is D are tombstones, the rest form the live
    table. Completes the upsert-only `cache_upsert_keep_latest` with
    the delete path a real replication pipeline needs. The change log
    is synthesized deterministically from orders (key = orderkey mod
    5000 forces multi-version keys; every 11th op is a delete).

    Plan shape: ONE window (partition by key, order by seq desc, rn=1)
    — the standard dedup-to-latest exchange; at scale this is the
    per-microbatch MERGE input and the key partitioning is the table's
    bucketing. Census arithmetic: exact counts + exact-DECIMAL live
    value mass."""
    log = table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 5000).alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 11 == 0, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    final = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    ops = log.agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.count(F.when(F.col("op") == "U", 1)).alias("n_upserts"),
        F.count(F.when(F.col("op") == "D", 1)).alias("n_deletes"),
    )
    state = final.agg(
        F.count(F.when(F.col("op") == "U", 1)).cast("bigint").alias("n_live_keys"),
        F.count(F.when(F.col("op") == "D", 1)).cast("bigint").alias("n_tombstones"),
        F.sum(
            F.when(F.col("op") == "U", F.col("payload")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("double")
        .alias("live_value_total"),
    )
    return ops.crossJoin(state).select(
        "n_ops", "n_upserts", "n_deletes",
        "n_live_keys", "n_tombstones", "live_value_total",
    )


# --- hierarchical time-bucket rollup (hypertable continuous aggregate) --

_HIER_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
monthly AS (
  SELECT CAST(date_trunc('month', day) AS DATE) AS mo,
         CAST(sum(n) AS BIGINT) AS n, sum(rev) AS rev
  FROM daily GROUP BY 1
),
yearly AS (
  SELECT CAST(EXTRACT(YEAR FROM mo) AS INT) AS yr,
         CAST(sum(n) AS BIGINT) AS n, sum(rev) AS rev
  FROM monthly GROUP BY 1
)
SELECT 'day' AS level, strftime(day, '%Y-%m-%d') AS bucket,
       CAST(n AS BIGINT) AS n_orders, CAST(rev AS DOUBLE) AS revenue
FROM daily
UNION ALL
SELECT 'month', strftime(mo, '%Y-%m-%d'), n, CAST(rev AS DOUBLE) FROM monthly
UNION ALL
SELECT 'year', CAST(yr AS VARCHAR), n, CAST(rev AS DOUBLE) FROM yearly
ORDER BY level, bucket
"""


@register("hierarchical_time_rollup", oracle=_HIER_ORACLE)
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: ONE fact scan builds the
    daily partials; month and year levels re-aggregate the NEXT-FINER
    level (sum-of-sums on exact DECIMAL — algebraic, so re-aggregation
    is exact), never touching the fact table again. The oracle computes
    each level the same way, and the DECIMAL carry makes the double
    cast identical. At 100 TB this is the continuous-aggregate
    maintenance posture: facts → finest bucket once, coarser levels
    from O(buckets) partials; a streaming twin would maintain the daily
    level with a watermark and refresh coarser levels from it."""
    o = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", "day").cast("date").alias("mo")
    ).agg(F.sum("n").cast("bigint").alias("n"), F.sum("rev").alias("rev"))
    yearly = monthly.groupBy(
        F.year("mo").cast("int").alias("yr")
    ).agg(F.sum("n").cast("bigint").alias("n"), F.sum("rev").alias("rev"))
    out = (
        daily.select(
            F.lit("day").alias("level"),
            F.date_format("day", "yyyy-MM-dd").alias("bucket"),
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("rev").cast("double").alias("revenue"),
        )
        .unionAll(
            monthly.select(
                F.lit("month"),
                F.date_format("mo", "yyyy-MM-dd"),
                "n",
                F.col("rev").cast("double"),
            )
        )
        .unionAll(
            yearly.select(
                F.lit("year"),
                F.col("yr").cast("string"),
                "n",
                F.col("rev").cast("double"),
            )
        )
    )
    return out.orderBy("level", "bucket")
