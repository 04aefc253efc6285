"""Scalar-function surface exercised as oracle-checked queries
(SURVEY.md §2-F): grid snap round-trips, bbox/date-range predicates,
month-index conversion, canonical hash keys, distance math.

Coordinates are derived deterministically from keys (custkey modulo
grid extents) — same arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.functions.grid import (
    in_bbox,
    index_to_lat,
    index_to_lon,
    lat_to_index,
    lon_to_index,
)
from ocean_data_pipeline_spark.functions.keys import query_key
from ocean_data_pipeline_spark.functions.timeidx import (
    date_to_month_index,
    month_index_to_date,
)
from ocean_data_pipeline_spark.queries import register

# Raw (unclamped, off-grid) coordinates derived from custkey: lat spans
# 5..65 in 0.1° steps (exercises clamping at both ends + snapping), lon
# spans −90..−60.
_RAW_LAT = "5.0 + (c_custkey % 600) * 0.1"
_RAW_LON = "-90.0 + (c_custkey % 300) * 0.1"

_SNAP_ORACLE = f"""
WITH raw AS (
  SELECT c_custkey, {_RAW_LAT} AS lat_raw, {_RAW_LON} AS lon_raw FROM customer
),
idx AS (
  SELECT c_custkey, lat_raw, lon_raw,
    CAST(least(90, greatest(0, round((55.0 - least(55.0, greatest(10.0, lat_raw))) / 0.25))) AS INT) AS lat_idx,
    CAST(least(60, greatest(0, round((least(-70.0, greatest(-85.0, lon_raw)) - (-85.0)) / 0.25))) AS INT) AS lon_idx
  FROM raw
)
SELECT lat_idx, lon_idx,
       55.0 - lat_idx * 0.25   AS snapped_lat,
       -85.0 + lon_idx * 0.25  AS snapped_lon,
       count(*)                AS n_points
FROM idx
GROUP BY 1, 2
ORDER BY lat_idx, lon_idx
"""


@register("grid_snap", oracle=_SNAP_ORACLE)
def grid_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coordinate→index→coordinate round-trip + per-cell occupancy.
    Pure projection + small hash-agg; zero UDFs."""
    c = table(spark, sf_dir, "customer")
    raw = c.select(
        "c_custkey",
        F.expr(_RAW_LAT).alias("lat_raw"),
        F.expr(_RAW_LON).alias("lon_raw"),
    )
    idx = raw.select(
        lat_to_index(F.col("lat_raw")).alias("lat_idx"),
        lon_to_index(F.col("lon_raw")).alias("lon_idx"),
    )
    return (
        idx.groupBy("lat_idx", "lon_idx")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(
            "lat_idx",
            "lon_idx",
            index_to_lat(F.col("lat_idx")).alias("snapped_lat"),
            index_to_lon(F.col("lon_idx")).alias("snapped_lon"),
            "n_points",
        )
        .orderBy("lat_idx", "lon_idx")
    )


_BBOX_ORACLE = f"""
WITH raw AS (
  SELECT c_custkey, c_mktsegment, {_RAW_LAT} AS lat_raw, {_RAW_LON} AS lon_raw FROM customer
)
SELECT c_mktsegment AS mktsegment,
       count(*) AS n_total,
       count(CASE WHEN lat_raw BETWEEN 10.0 AND 55.0
                   AND lon_raw BETWEEN -85.0 AND -70.0 THEN 1 END) AS n_in_bbox
FROM raw
GROUP BY 1
ORDER BY mktsegment
"""


@register("bbox_validation", oracle=_BBOX_ORACLE)
def bbox_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pred-bbox as a conditional aggregate (validation truth table
    generalized to a relation; reference config.py:154-165)."""
    c = table(spark, sf_dir, "customer")
    raw = c.select(
        "c_mktsegment",
        F.expr(_RAW_LAT).alias("lat_raw"),
        F.expr(_RAW_LON).alias("lon_raw"),
    )
    return (
        raw.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(
                F.when(in_bbox(F.col("lat_raw"), F.col("lon_raw")), F.lit(1))
            ).alias("n_in_bbox"),
        )
        .orderBy("mktsegment")
    )


# Month-index conversion on the testdata epoch (orders span 1995-2001;
# 84-month window plays the reference's 72-month role).
_EPOCH_YEAR = 1995
_N_MONTHS = 84

_MONTHIDX_ORACLE = f"""
WITH idx AS (
  SELECT o_orderkey,
    CAST(least({_N_MONTHS - 1}, greatest(0,
      (year(o_orderdate) - {_EPOCH_YEAR}) * 12 + (month(o_orderdate) - 1))) AS INT) AS month_idx
  FROM orders
)
SELECT month_idx,
       strftime(DATE '{_EPOCH_YEAR}-01-01' + to_months(month_idx), '%Y-%m-%d') AS month_start,
       count(*) AS n_orders
FROM idx
GROUP BY month_idx
ORDER BY month_idx
"""


@register("month_index", oracle=_MONTHIDX_ORACLE)
def month_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date→month-index→first-of-month round-trip over orders."""
    o = table(spark, sf_dir, "orders")
    idx = o.select(
        date_to_month_index(F.col("o_orderdate"), _EPOCH_YEAR, _N_MONTHS).alias("month_idx")
    )
    return (
        idx.groupBy("month_idx")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "month_idx",
            F.date_format(month_index_to_date(F.col("month_idx"), _EPOCH_YEAR), "yyyy-MM-dd").alias(
                "month_start"
            ),
            "n_orders",
        )
        .orderBy("month_idx")
    )


# Canonical cache keys over snapped grid coordinates (fn-hash-key): the
# 0.25°-grid values have ≤2 decimal digits → %.6f formatting is exact.
_HASHKEY_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         10.0  + (c_custkey % 91) * 0.25 AS lat,
         -85.0 + (c_custkey % 61) * 0.25 AS lon
  FROM customer WHERE c_custkey % 100 = 0
)
SELECT c_custkey AS custkey,
       substr(sha256(concat_ws('_',
         printf('%.6f', lat), printf('%.6f', lon),
         '1995-01-01', '2001-12-31',
         array_to_string(list_sort(['Temperature','Salinity']), '_'))), 1, 16) AS query_hash
FROM pts
ORDER BY custkey
"""


@register("cache_key_hash", oracle=_HASHKEY_ORACLE)
def cache_key_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-256[:16] canonical key as a single JVM-side projection."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    pts = c.select(
        "c_custkey",
        (F.lit(10.0) + (F.col("c_custkey") % 91) * F.lit(0.25)).alias("lat"),
        (F.lit(-85.0) + (F.col("c_custkey") % 61) * F.lit(0.25)).alias("lon"),
    )
    return pts.select(
        F.col("c_custkey").alias("custkey"),
        query_key(
            F.col("lat"),
            F.col("lon"),
            F.lit("1995-01-01"),
            F.lit("2001-12-31"),
            ["Temperature", "Salinity"],
        ).alias("query_hash"),
    ).orderBy("custkey")


_DATERANGE_ORACLE = """
SELECT
  count(CASE WHEN o_orderdate >= DATE '1995-01-01'
              AND o_orderdate <= DATE '2001-12-31' THEN 1 END) AS n_in_window,
  count(CASE WHEN (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
             BETWEEN 0 AND 71 THEN 1 END)                      AS n_within_72_months,
  count(*)                                                     AS n_total
FROM orders
"""


@register("daterange_validation", oracle=_DATERANGE_ORACLE)
def daterange_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pred-daterange: window containment + ≤72-month span counts
    (reference config.py:167-195)."""
    o = table(spark, sf_dir, "orders")
    in_window = (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")) & (
        F.col("o_orderdate") <= F.lit("2001-12-31").cast("date")
    )
    month_delta = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    return o.agg(
        F.count(F.when(in_window, F.lit(1))).alias("n_in_window"),
        F.count(F.when(month_delta.between(0, 71), F.lit(1))).alias("n_within_72_months"),
        F.count(F.lit(1)).alias("n_total"),
    )


# --- monthly climatology (month-of-year normals) -----------------------

_CLIMATOLOGY_ORACLE = """
SELECT event_type,
       month(ts)                                   AS month,
       count(value)                                AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             / count(value), 4)                    AS mean_value,
       round(sqrt((CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   - CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     * CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value))
                  / (count(value) - 1)), 4)        AS stddev_value,
       min(value)                                  AS min_value,
       max(value)                                  AS max_value
FROM events
GROUP BY event_type, month(ts)
ORDER BY event_type, month
"""


@register("monthly_climatology", oracle=_CLIMATOLOGY_ORACLE)
def monthly_climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year climatology normals — THE oceanographic rollup the
    reference's dashboard time-series view builds toward (monthly
    means across years; dashboard/app.py's summary statistics): per
    (event_type, calendar month) count/mean/stddev/min/max, with
    mean/stddev computed from exact decimal sums (sum, sum-of-squares)
    so no float-summation-order drift crosses engines.

    One scan, one partial-agg shuffle on 12×|event_type| groups — the
    group count is calendar-bounded, so the plan is identical at
    100 TB (partial aggregation does all the data reduction
    map-side)."""
    ev = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    n = F.count("value")
    sm = F.sum(dec).cast("double")
    smsq = F.sum(dec * dec).cast("double")
    return (
        ev.groupBy("event_type", F.month("ts").alias("month"))
        .agg(
            n.alias("n_events"),
            # when() guards keep the divisions unevaluated for n=0 /
            # n=1 groups (Spark's If short-circuits): under ANSI mode a
            # zero divisor RAISES, and a degenerate group must yield
            # NULL stats, not kill the job
            F.when(n > 0, F.round(sm / n, 4)).alias("mean_value"),
            F.when(
                n > 1, F.round(F.sqrt((smsq - sm * sm / n) / (n - 1)), 4)
            ).alias("stddev_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type", "month")
    )


# --- climatology anomalies ---------------------------------------------

_ANOMALY_ORACLE = """
WITH clim AS (
  SELECT event_type,
         month(ts) AS month,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(value), 4) AS mean_value,
         round(sqrt((CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     - CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       * CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value))
                    / (count(value) - 1)), 4) AS stddev_value
  FROM events GROUP BY event_type, month(ts)
),
scored AS (
  SELECT e.event_type, month(e.ts) AS month,
         abs(e.value - c.mean_value) / c.stddev_value AS abs_z
  FROM events e
  JOIN clim c ON c.event_type = e.event_type AND c.month = month(e.ts)
  WHERE e.value IS NOT NULL AND c.stddev_value > 0
)
SELECT event_type, month,
       count(*)                                        AS n_events,
       CAST(sum(CASE WHEN abs_z > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       round(max(abs_z), 4)                            AS max_abs_z
FROM scored
GROUP BY event_type, month
ORDER BY event_type, month
"""


@register("climatology_anomalies", oracle=_ANOMALY_ORACLE)
def climatology_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection against the monthly climatology: every
    observation z-scores against its (event_type, month) normal; the
    |z| > 2 tail is the anomaly census (the reference's out-of-range
    quality flags, upgraded from fixed bounds to seasonal normals).

    The climatology relation is calendar-bounded (12×|event_type|
    rows) so it BROADCASTS — the fact scan never shuffles; normals are
    rounded to 4 decimals before z-scoring so both engines score
    against identical constants."""
    ev = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    n = F.count("value")
    sm = F.sum(dec).cast("double")
    smsq = F.sum(dec * dec).cast("double")
    clim = ev.groupBy("event_type", F.month("ts").alias("month")).agg(
        # same ANSI-safe guards as monthly_climatology: a group with
        # fewer than two observations has no stddev, and the division
        # must not evaluate (zero divisor raises under ANSI)
        F.when(n > 0, F.round(sm / n, 4)).alias("mean_value"),
        F.when(
            n > 1, F.round(F.sqrt((smsq - sm * sm / n) / (n - 1)), 4)
        ).alias("stddev_value"),
    )
    scored = (
        ev.filter(F.col("value").isNotNull())
        .withColumn("month", F.month("ts"))
        .join(F.broadcast(clim), ["event_type", "month"])
        .filter(F.col("stddev_value") > 0)
        .select(
            "event_type",
            "month",
            (F.abs(F.col("value") - F.col("mean_value")) / F.col("stddev_value")).alias(
                "abs_z"
            ),
        )
    )
    return (
        scored.groupBy("event_type", "month")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("abs_z") > 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
            F.round(F.max("abs_z"), 4).alias("max_abs_z"),
        )
        .orderBy("event_type", "month")
    )


# --- Z-order layout locality -------------------------------------------


def _bit(col, i: int):
    """i-th bit of a non-negative int column via div/mod (portable to
    any SQL engine — no bit-op dialect differences)."""
    return (col / F.lit(2**i)).cast("bigint") % 2


def zorder_key(lat_idx, lon_idx, bits: int = 7):
    """Interleave `bits` bits of (lat_idx, lon_idx) into a Z-order
    (Morton) key: lat bits land at odd positions, lon at even. Pure
    integer arithmetic → identical in any engine, and a sortable
    layout key: writing files sorted by z-key gives 2-D locality, so a
    bbox predicate prunes ~O(perimeter) files instead of O(rows)
    (the Delta/Iceberg OPTIMIZE ZORDER trick, expressed as a plain
    column)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + _bit(lat_idx, i) * F.lit(2 ** (2 * i + 1)) + _bit(lon_idx, i) * F.lit(
            2 ** (2 * i)
        )
    return z


def _zorder_sql(lat: str, lon: str, bits: int = 7) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({lat} // {2**i}) % 2) * {2 ** (2 * i + 1)}")
        terms.append(f"(({lon} // {2**i}) % 2) * {2 ** (2 * i)}")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
WITH raw AS (
  SELECT {_RAW_LAT} AS lat_raw, {_RAW_LON} AS lon_raw FROM customer
),
cells AS (
  SELECT DISTINCT
    CAST(least(90, greatest(0, round((55.0 - least(55.0, greatest(10.0, lat_raw))) / 0.25))) AS BIGINT) AS lat_idx,
    CAST(least(60, greatest(0, round((least(-70.0, greatest(-85.0, lon_raw)) - (-85.0)) / 0.25))) AS BIGINT) AS lon_idx
  FROM raw
),
keyed AS (
  SELECT lat_idx, lon_idx,
         ({_zorder_sql("lat_idx", "lon_idx")}) // 64        AS z_bucket,
         (lat_idx * 61 + lon_idx) // 64                     AS rm_bucket
  FROM cells
),
probe AS (
  SELECT * FROM keyed
  WHERE lat_idx BETWEEN 1 AND 16 AND lon_idx BETWEEN 44 AND 59
)
SELECT 'row-major' AS layout, count(*) AS n_cells_probed,
       count(DISTINCT rm_bucket) AS n_buckets_touched
FROM probe
UNION ALL
SELECT 'z-order', count(*), count(DISTINCT z_bucket) FROM probe
ORDER BY layout
"""


@register("zorder_layout_stats", oracle=_ZORDER_ORACLE)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout design probe: bucket the occupied grid cells into
    64-cell files under (a) row-major order and (b) Z-order (Morton)
    interleaving, then count how many buckets a 16×16 bbox probe
    touches under each layout (the occupied cells lie on a
    custkey-derived curve, so the probe covers the densest 16×16
    window). Z-order's interleaved key keeps 2-D neighborhoods in the
    same bucket, so the bbox touches ~O(area/64) buckets where
    row-major touches one bucket per grid row — the
    measured justification for sorting 100 TB of gridded writes by
    z-key before binning into parquet files (partition pruning then
    skips the untouched files).

    Integer div/mod bit extraction only — no engine bit-op dialect;
    the probe is a conditional aggregate over the distinct-cell
    relation."""
    c = table(spark, sf_dir, "customer")
    cells = (
        c.select(
            F.expr(_RAW_LAT).alias("lat_raw"),
            F.expr(_RAW_LON).alias("lon_raw"),
        )
        .select(
            lat_to_index(F.col("lat_raw")).cast("bigint").alias("lat_idx"),
            lon_to_index(F.col("lon_raw")).cast("bigint").alias("lon_idx"),
        )
        .distinct()
    )
    keyed = cells.select(
        "lat_idx",
        "lon_idx",
        (zorder_key(F.col("lat_idx"), F.col("lon_idx")) / 64)
        .cast("bigint")
        .alias("z_bucket"),
        ((F.col("lat_idx") * 61 + F.col("lon_idx")) / 64)
        .cast("bigint")
        .alias("rm_bucket"),
    )
    probe = keyed.filter(
        F.col("lat_idx").between(1, 16) & F.col("lon_idx").between(44, 59)
    )
    rm = probe.agg(
        F.lit("row-major").alias("layout"),
        F.count(F.lit(1)).alias("n_cells_probed"),
        F.countDistinct("rm_bucket").alias("n_buckets_touched"),
    ).select("layout", "n_cells_probed", "n_buckets_touched")
    zo = probe.agg(
        F.lit("z-order").alias("layout"),
        F.count(F.lit(1)).alias("n_cells_probed"),
        F.countDistinct("z_bucket").alias("n_buckets_touched"),
    ).select("layout", "n_cells_probed", "n_buckets_touched")
    return rm.unionByName(zo).orderBy("layout")


# --- great-circle (haversine) radius lookup ---------------------------

# 200 km radius pre-bounded to a lat/lon box before the exact haversine:
# 200/111.0 deg of latitude, widened by 1/cos(21 deg) for longitude.
_HAV_LAT_W = 1.81
_HAV_LON_W = 1.94

_HAVERSINE_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         10.0  + (c_custkey % 91) * 0.25 AS lat,
         -85.0 + (c_custkey % 61) * 0.25 AS lon
  FROM customer
),
boxed AS (
  SELECT * FROM pts
  WHERE lat BETWEEN 21.0 - {_HAV_LAT_W} AND 21.0 + {_HAV_LAT_W}
    AND lon BETWEEN -77.0 - {_HAV_LON_W} AND -77.0 + {_HAV_LON_W}
),
scored AS (
  SELECT c_custkey, lat, lon,
         round(2 * 6371.0088 * asin(sqrt(
             sin(radians(lat - 21.0) / 2) * sin(radians(lat - 21.0) / 2)
           + cos(radians(21.0)) * cos(radians(lat))
             * sin(radians(lon - (-77.0)) / 2) * sin(radians(lon - (-77.0)) / 2)
         )), 4) AS dist_km
  FROM boxed
)
SELECT c_custkey AS custkey, lat, lon, dist_km
FROM scored
WHERE dist_km < 200.0
ORDER BY dist_km, custkey
LIMIT 50
"""


@register("haversine_nearby", oracle=_HAVERSINE_ORACLE)
def haversine_nearby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle radius lookup: the reference's nearby-point cache
    query (cache_manager.py range lookup) upgraded from planar L1/L2
    to true haversine distance. The 200 km radius is FIRST bounded to
    a lat/lon box — a pushable range predicate that reaches the scan
    (at 100 TB with z-order or lat/lon partitioning this prunes files;
    the trig runs only on the boxed remainder), then exact haversine
    exact haversine then filters and ranks; distances round to 4
    decimals BEFORE the radius compare and ordering, so cross-engine
    libm ULP drift cannot flip membership or rank; custkey breaks
    ties."""
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (F.lit(10.0) + (F.col("c_custkey") % 91) * F.lit(0.25)).alias("lat"),
        (F.lit(-85.0) + (F.col("c_custkey") % 61) * F.lit(0.25)).alias("lon"),
    )
    boxed = pts.filter(
        F.col("lat").between(21.0 - _HAV_LAT_W, 21.0 + _HAV_LAT_W)
        & F.col("lon").between(-77.0 - _HAV_LON_W, -77.0 + _HAV_LON_W)
    )
    dlat = F.radians(F.col("lat") - F.lit(21.0)) / 2
    dlon = F.radians(F.col("lon") - F.lit(-77.0)) / 2
    hav = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(F.lit(21.0)))
        * F.cos(F.radians(F.col("lat")))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    scored = boxed.select(
        F.col("c_custkey").alias("custkey"),
        "lat",
        "lon",
        F.round(F.lit(2 * 6371.0088) * F.asin(F.sqrt(hav)), 4).alias("dist_km"),
    )
    return (
        scored.filter(F.col("dist_km") < 200.0)
        .orderBy("dist_km", "custkey")
        .limit(50)
    )


# --- grid hotspot clustering (DBSCAN-lite) ----------------------------

_HOTSPOT_ORACLE = """
WITH RECURSIVE
cells AS (
  SELECT CAST(l_quantity AS INT) AS x,
         CAST(floor(l_extendedprice / 5000) AS INT) AS y,
         count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT count(*) AS n_cells, CAST(sum(n) AS DOUBLE) AS n_points FROM cells
),
dense AS (
  SELECT c.x, c.y, c.n, c.x * 100000 + c.y AS cell
  FROM cells c CROSS JOIN tot t
  WHERE c.n >= 1.25 * (t.n_points / t.n_cells)
),
offsets AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1))
       o(dx, dy)
),
edges AS (
  SELECT a.cell AS u, b.cell AS v
  FROM dense a
  CROSS JOIN offsets o
  JOIN dense b ON b.cell = (a.x + o.dx) * 100000 + (a.y + o.dy)
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
),
labels AS (SELECT u, min(r) AS component FROM reach GROUP BY u)
SELECT coalesce(l.component, d.cell) AS cluster_id,
       count(*) AS n_cells,
       CAST(sum(d.n) AS BIGINT) AS n_points,
       min(d.x) AS x_min, max(d.x) AS x_max,
       min(d.y) AS y_min, max(d.y) AS y_max
FROM dense d LEFT JOIN labels l ON l.u = d.cell
GROUP BY 1
ORDER BY n_points DESC, cluster_id
"""


@register("grid_hotspot_clusters", oracle=_HOTSPOT_ORACLE)
def grid_hotspot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-grid clustering (the grid flavor of DBSCAN): bin points
    into fixed cells over the (quantity, price-band) feature plane,
    keep cells ≥1.25× the mean occupancy, and merge 8-adjacent dense
    cells into clusters via connected components — the hotspot
    detector for feature-space or geo density (the threshold is
    scale-RELATIVE, so the query is meaningful at any SF).

    Scale: points reduce to O(cells) immediately (one map-side
    combining agg); adjacency is an EQUI-join — each dense cell
    explodes into its 8 neighbor keys and probes the dense-cell set,
    never a theta-join over coordinates; components run on the dense
    subgraph (operators/components.py, label-propagation rounds).
    The recursive-CTE oracle closes the same adjacency in DuckDB."""
    from ocean_data_pipeline_spark.operators.components import connected_components

    li = table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("int").alias("x"),
        F.floor(F.col("l_extendedprice") / 5000).cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").cast("double").alias("n_points"),
    )
    dense = (
        cells.crossJoin(F.broadcast(tot))
        .filter(F.col("n") >= 1.25 * (F.col("n_points") / F.col("n_cells")))
        .select("x", "y", "n", (F.col("x") * 100000 + F.col("y")).alias("cell"))
    )
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)],
        "dx int, dy int",
    )
    probes = dense.crossJoin(F.broadcast(offsets)).select(
        F.col("cell").alias("u"),
        ((F.col("x") + F.col("dx")) * 100000 + (F.col("y") + F.col("dy"))).alias(
            "nbr"
        ),
    )
    edges = probes.join(
        dense.select(F.col("cell").alias("v")), probes.nbr == F.col("v")
    ).select("u", "v")
    labels = connected_components(edges, src="u", dst="v")
    return (
        dense.join(labels, dense.cell == labels.id, "left")
        .withColumn("cluster_id", F.coalesce("component", "cell"))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy(F.col("n_points").desc(), "cluster_id")
    )


# --- point-in-polygon containment census ------------------------------

#: Survey region: an irregular hexagon over the custkey-derived
#: coordinate domain (lat 5..65, lon -90..-60). Vertices sit on .137/
#: .713-style offsets so no data point is ever collinear with an edge
#: (the ray-cast's only degenerate case).
_POLY = (
    (12.337, -87.113),
    (27.713, -89.431),
    (49.237, -84.619),
    (61.173, -73.291),
    (41.617, -61.739),
    (17.431, -65.917),
)


def _ray_cast_sql(lat: str, lon: str) -> str:
    """Σ edge-crossing CASEs (odd => inside): identical text for both
    engines — doubles appear only in per-edge comparisons, never in an
    accumulated float sum, so parity is exact."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        yi, xi = _POLY[i]
        yj, xj = _POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({yi} > {lat}) <> ({yj} > {lat})) AND "
            f"({lon} < ({xj} - {xi}) * ({lat} - {yi}) / ({yj} - {yi}) + {xi}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


_PIP_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey, {_RAW_LAT} AS lat, {_RAW_LON} AS lon
  FROM customer
),
flagged AS (
  SELECT c_nationkey,
         CASE WHEN {_ray_cast_sql("lat", "lon")} THEN 1 ELSE 0 END AS inside
  FROM pts
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(inside) AS BIGINT) AS n_inside,
       CAST(sum(inside) AS DOUBLE) / count(*) AS inside_share
FROM flagged f JOIN nation n ON n.n_nationkey = f.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("point_in_polygon_census", oracle=_PIP_ORACLE)
def point_in_polygon_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment census: ray casting (Shimrat,
    CACM'62 / the classic crossing-number test) against a fixed
    6-vertex survey region, unrolled to one CASE per edge — the
    geo-fencing primitive a sensor pipeline needs (reference parity:
    the reference filters on rectangular bboxes only; this is the
    general-polygon upgrade of `bbox_validation`). Counted per nation.

    Determinism: each edge test is a fixed double expression of exact
    literals and custkey-derived coordinates — no accumulation, no
    libm; the crossing count is an integer sum.

    Plan shape: the containment test is a pure per-row projection
    (fuses into the scan under whole-stage codegen), one shuffle for
    the nation rollup, broadcast join to the 25-row nation dim. At
    100 TB: a single-pass filter — and because the test is an
    expression, Catalyst can push a bounding-box pre-filter
    (min/max lat/lon of the polygon) down to the parquet scan to
    skip row groups entirely outside the region."""
    pts = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr(_RAW_LAT).alias("lat"),
        F.expr(_RAW_LON).alias("lon"),
    )
    flagged = pts.select(
        "c_nationkey",
        F.when(F.expr(_ray_cast_sql("lat", "lon")), 1).otherwise(0).alias("inside"),
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        flagged.join(
            F.broadcast(nation), flagged["c_nationkey"] == nation["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("inside").cast("bigint").alias("n_inside"),
            (F.sum("inside").cast("double") / F.count(F.lit(1))).alias(
                "inside_share"
            ),
        )
        .orderBy("n_name")
    )
