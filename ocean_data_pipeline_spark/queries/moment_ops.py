"""Higher-moment and weighted-order statistics in exact arithmetic:
per-group skewness / excess kurtosis from cents-integer DECIMAL power
sums, and exact weighted quantiles via cumulative-weight selection
(SURVEY.md §2 agg-describe siblings — the reference's describe panel
stops at mean/std; shape moments and weighted medians are what a
distribution-drift monitor needs on top).

Determinism strategy: prices are cents-exact doubles, so
round(price*100) is an exact integer; every power sum is carried as an
integer-valued DECIMAL (one explicit downcast keeps the 4th power
inside DECIMAL(38)); the closed-form moment chains then run on
bit-identical doubles. Skewness/kurtosis are scale-invariant, so
computing them on cents instead of dollars changes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# --- exact skewness / kurtosis ----------------------------------------

_MOM_ORACLE = """
WITH c AS (
  -- DECIMAL(19,0) operands force both engines onto the int128 path:
  -- DuckDB clamps (10,0)x(10,0) to DECIMAL(18,0) (int64, overflows);
  -- (19,0)x(19,0) lands at DECIMAL(38,0) on both engines, exactly.
  SELECT l_returnflag,
         CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(19,0)) AS cw
  FROM lineitem
),
p AS (
  SELECT l_returnflag, cw AS c,
         cw * cw AS c2,
         CAST(cw * cw AS DECIMAL(19,0)) * cw AS c3,
         CAST(cw * cw AS DECIMAL(19,0)) * CAST(cw * cw AS DECIMAL(19,0)) AS c4
  FROM c
),
s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(c) AS DOUBLE) AS s1,
         CAST(sum(c2) AS DOUBLE) AS s2,
         CAST(sum(c3) AS DOUBLE) AS s3,
         CAST(sum(c4) AS DOUBLE) AS s4
  FROM p GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       (s1 / n) / 100.0 AS mean_price,
       CASE WHEN s2 / n - (s1 / n) * (s1 / n) <> 0 THEN
         (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
           / ((s2 / n - (s1 / n) * (s1 / n))
              * sqrt(s2 / n - (s1 / n) * (s1 / n))) END AS skewness,
       CASE WHEN s2 / n - (s1 / n) * (s1 / n) <> 0 THEN
         (s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
           / ((s2 / n - (s1 / n) * (s1 / n))
              * (s2 / n - (s1 / n) * (s1 / n))) - 3 END AS excess_kurtosis
FROM s
ORDER BY l_returnflag
"""


@register("skew_kurtosis_exact", oracle=_MOM_ORACLE)
def skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of the price
    distribution per return flag, from exact integer power sums:
    m_k expands into raw moments (S1..S4), each an exact DECIMAL sum of
    cents-integer powers — no per-row (x-mean) pass whose accumulation
    order could drift, the same no-centering device as
    `acf_monthly_revenue` / `ols_price_regression` raised to the 4th
    moment. m2^1.5 is written m2*sqrt(m2) (sqrt is correctly rounded
    IEEE; pow is not guaranteed to be).

    The 4th-power type walk: cents as DECIMAL(19,0) operands force the
    int128 multiply path on both engines (DuckDB clamps a (10,0) x
    (10,0) product to int64 DECIMAL(18,0), which overflows); the square
    is downcast to DECIMAL(19,0) — exact, c^2 <= 1e14 — so c^3 = c2*c
    and c^4 = c2*c2 both land at DECIMAL(38,0) without crossing the
    38-digit cap.

    Plan shape: one map-side-combining shuffle keyed on the flag; all
    shape arithmetic happens on a 4-row relation. At 100 TB this is the
    cheapest possible distribution-shape monitor — a single pass, five
    partial aggregates per group."""
    c = F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("decimal(19,0)")
    c2w = (c * c).cast("decimal(19,0)")
    p = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        c.alias("c"),
        (c * c).alias("c2"),
        (c2w * c).alias("c3"),
        (c2w * c2w).alias("c4"),
    )
    s = p.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("double").alias("s1"),
        F.sum("c2").cast("double").alias("s2"),
        F.sum("c3").cast("double").alias("s3"),
        F.sum("c4").cast("double").alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    m2c = F.col("s2") / n - m1 * m1
    m3c = F.col("s3") / n - 3 * m1 * (F.col("s2") / n) + 2 * m1 * m1 * m1
    m4c = (
        F.col("s4") / n
        - 4 * m1 * (F.col("s3") / n)
        + 6 * m1 * m1 * (F.col("s2") / n)
        - 3 * m1 * m1 * m1 * m1
    )
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        (m1 / 100.0).alias("mean_price"),
        F.when(m2c != 0, m3c / (m2c * F.sqrt(m2c))).alias("skewness"),
        F.when(m2c != 0, m4c / (m2c * m2c) - 3).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


# --- exact weighted quantiles -----------------------------------------

_WMED_ORACLE = """
WITH lv AS (  -- one row per (flag, price level): summed quantity weight
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, pc, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY pc) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM lv
)
SELECT l_returnflag,
       CAST(max(tw) AS BIGINT) AS total_weight,
       min(CASE WHEN 4 * cw >= tw     THEN pc END) / 100.0 AS wq25,
       min(CASE WHEN 2 * cw >= tw     THEN pc END) / 100.0 AS wmedian,
       min(CASE WHEN 4 * cw >= 3 * tw THEN pc END) / 100.0 AS wq75
FROM cum
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("weighted_median_price", oracle=_WMED_ORACLE)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted price quartiles per return flag: the
    weighted q-quantile is the smallest price level whose cumulative
    weight reaches q of the total — selection entirely in integer
    arithmetic (cents-integer levels, integer weights, the comparison
    written cross-multiplied as q_den*cw >= q_num*tw so no division
    ever happens before the final display scaling).

    Plan shape: the fact table collapses to DISTINCT price levels per
    group first (one map-side-combining shuffle — levels are value-
    domain-bounded, far smaller than rows), then the cumulative weight
    rides the FIXED-WIDTH coarsening mode of the distributed
    running-sum device (operators/ranks.py bucket_width: bucket =
    floor(cents / $1000) — a pure expression, so the whole query is
    ONE lazy plan with no approxQuantile pass or checkpoint; the
    offset census is bounded by price-domain/$1000 ≈ a few hundred
    rows; near-unique cents levels would otherwise sort in ONE task).
    At 100 TB the level relation is what makes the exact answer
    tractable; if even levels blow up, this degrades gracefully to the
    same algebra over histogram bins."""
    from ocean_data_pipeline_spark.operators.ranks import with_running_aggs

    lv = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
            F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        )
        .groupBy("l_returnflag", "pc")
        .agg(F.sum("q").alias("w"))
    )
    tot = lv.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    cum = (
        with_running_aggs(
            lv,
            ["pc"],
            "pc",
            {"cw": ("w", "sum", True)},
            partition_by=["l_returnflag"],
            bucket_width=100_000.0,  # $1000 in cents
        )
        .join(F.broadcast(tot), "l_returnflag")
        .select("l_returnflag", "pc", "cw", "tw")
    )
    def pick(num: int, den: int):
        return F.min(
            F.when(den * F.col("cw") >= num * F.col("tw"), F.col("pc"))
        ) / 100.0
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.max("tw").cast("bigint").alias("total_weight"),
            pick(1, 4).alias("wq25"),
            pick(1, 2).alias("wmedian"),
            pick(3, 4).alias("wq75"),
        )
        .orderBy("l_returnflag")
    )


# --- equi-depth histogram (CBO statistics) ----------------------------

_EQD_BINS = 10

_EQD_ORACLE = f"""
WITH lv AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc, count(*) AS cnt
  FROM orders GROUP BY 1
),
cum AS (
  SELECT pc, cnt,
         sum(cnt) OVER (ORDER BY pc) AS cn,
         sum(cnt) OVER () AS n
  FROM lv
),
tagged AS (  -- bin of a level = which decile its LAST row lands in
  SELECT pc, cnt, cn, n,
         least({_EQD_BINS} - 1,
               ({_EQD_BINS} * (cn - 1)) // n) AS bin
  FROM cum
)
SELECT CAST(bin AS INT) AS bin,
       min(pc) / 100.0 AS lo_value,
       max(pc) / 100.0 AS hi_value,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct_values
FROM tagged
GROUP BY bin
ORDER BY bin
"""


@register("equi_depth_histogram", oracle=_EQD_ORACLE)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) 10-bin histogram of order value — the
    statistic a cost-based optimizer keeps per column (Spark's own
    ANALYZE ... FOR COLUMNS computes exactly this shape), and the
    `value_histogram_events` (fixed-range) sibling with data-adaptive
    boundaries. A cents-integer level is assigned to the decile of its
    cumulative position by pure integer floor-division — no quantile
    approximation, no double comparisons anywhere; per bin: value
    range, row count, and distinct-value count (the NDV-per-bucket a
    CBO uses for selectivity).

    Plan shape: one map-side-combining shuffle to the value-level
    census, then the cumulative count rides the distributed
    running-sum device (operators/ranks.py — boundary-bucketed K-way
    windows + broadcast prefix offsets; near-unique cents levels would
    otherwise sort in ONE task, VERDICT r06 item 5) over the
    localCheckpointed level census, one tiny rollup. At 100 TB: exact
    histograms from a single pass plus level-sized post-processing."""
    from ocean_data_pipeline_spark.operators.ranks import with_running_aggs

    lv = (
        table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("pc"))
        .groupBy("pc")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    n_all = lv.agg(F.sum("cnt").alias("n"))
    cum = (
        # fixed-width coarsening ($1000 cents buckets): bounded value
        # domain, fully lazy — no approxQuantile job (see ranks.py).
        with_running_aggs(
            lv, ["pc"], "pc", {"cn": ("cnt", "sum", True)},
            bucket_width=100_000.0,
        )
        .crossJoin(F.broadcast(n_all))
        .select("pc", "cnt", "cn", "n")
    )
    bin_ = F.least(
        F.lit(_EQD_BINS - 1),
        F.expr(f"({_EQD_BINS} * (cn - 1)) div n"),
    )
    return (
        cum.select(bin_.cast("int").alias("bin"), "pc", "cnt")
        .groupBy("bin")
        .agg(
            (F.min("pc") / 100.0).alias("lo_value"),
            (F.max("pc") / 100.0).alias("hi_value"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_values"),
        )
        .select("bin", "lo_value", "hi_value", "n_rows", "n_distinct_values")
        .orderBy("bin")
    )


# --- Gaussian KDE on a fixed grid ------------------------------------------

_KDE_ORACLE = """
WITH base AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
),
mom AS (  -- exact decimal moments for sigma (the skew_kurtosis device)
  SELECT count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(19,2))
                       * CAST(o_totalprice AS DECIMAL(19,2))) AS VARCHAR)
              AS DOUBLE) AS s2
  FROM orders
),
band AS (
  -- n>1 guard mirrors the engine: degenerate single-row input yields
  -- NULL sigma/h/densities on BOTH sides (not inf-derived values)
  SELECT n,
         CASE WHEN n > 1
              THEN 1.06 * sqrt((s2 - s1 * s1 / n) / (n - 1)) * pow(n, -0.2)
         END AS h,
         s1 / n AS mu,
         CASE WHEN n > 1
              THEN sqrt((s2 - s1 * s1 / n) / (n - 1))
         END AS sigma
  FROM mom
),
grid AS (  -- 32 evaluation points at mu + k*sigma/4, k = -16..15
  SELECT g AS gi, b.mu + (g - 16) * b.sigma / 4 AS gx, b.h, b.n
  FROM (SELECT unnest(generate_series(0, 31)) AS g), band b
),
dens AS (
  -- each kernel term rounds ONCE into a picounit BIGINT
  -- (round(k*1e12) of the identical double on both engines), so the
  -- per-grid-point sums are exact integer arithmetic — the
  -- embedding_isotropy_audit device, ~2x cheaper than DECIMAL(38,12)
  SELECT g.gi, g.gx,
         CAST(sum(CAST(round(
           exp(-((g.gx - t.x) / g.h) * ((g.gx - t.x) / g.h) / 2)
           * 1000000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000000.0
           / (g.n * g.h * sqrt(2 * pi())) AS f
  FROM grid g CROSS JOIN base t
  GROUP BY g.gi, g.gx, g.n, g.h
)
SELECT gi AS grid_index,
       round(gx, 2) AS x,
       round(f, 12) AS density
FROM dens ORDER BY grid_index
"""


@register("gaussian_kde_grid", oracle=_KDE_ORACLE)
def gaussian_kde_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of the order-price distribution
    on a fixed 32-point grid (mu ± 4 sigma), bandwidth by Silverman's
    rule h = 1.06 sigma n^(-1/5) — the smooth-density sibling of
    `equi_depth_histogram` / `value_histogram_events`, and the standard
    visual-diagnostics panel behind every distribution dashboard.

    Determinism: sigma comes from exact decimal power sums (int128
    products, VARCHAR-hop cast); each kernel evaluation rounds ONCE
    into DECIMAL(38,12) before the per-grid-point sum, so the density
    is partitioning-invariant; grid points are fixed chains of (mu,
    sigma).

    Plan shape: one exact-moment aggregate broadcast back, then ONE
    scan evaluates all 32 kernels per row (grid broadcast,
    map-side-combined into 32 cells). At 100 TB: a single pass, 32-row
    shuffle — KDE as partial aggregation, never a row-pair join."""
    o = table(spark, sf_dir, "orders", spread=True)
    x19 = F.col("o_totalprice").cast("decimal(19,2)")
    mom = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum(x19 * x19).cast("string").cast("double").alias("s2"),
    )
    # n>1 guard: a single-row table would hit ANSI DIVIDE_BY_ZERO on
    # the (n-1) Bessel denominator; NULL sigma/h propagate to NULL
    # densities instead (totality over degenerate inputs).
    var = F.when(
        F.col("n") > 1,
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1),
    )
    band = mom.select(
        "n",
        (1.06 * F.sqrt(var) * F.pow(F.col("n"), -0.2)).alias("h"),
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(var).alias("sigma"),
    )
    grid = (
        spark.range(32)
        .select(F.col("id").cast("int").alias("gi"))
        .crossJoin(F.broadcast(band))
        .select(
            "gi",
            (F.col("mu") + (F.col("gi") - 16) * F.col("sigma") / 4).alias("gx"),
            "h",
            "n",
        )
    )
    base = o.select(F.col("o_totalprice").cast("double").alias("x"))
    u = (F.col("gx") - F.col("x")) / F.col("h")
    # picounit-BIGINT kernel terms (the embedding_isotropy_audit
    # device): round(k*1e12) of the identical double on both engines,
    # summed as exact integers — ~2x cheaper than per-term
    # DECIMAL(38,12) accumulation (VERDICT r06 item 6). Long partials
    # hold to ~9e6 rows per grid point (terms <= 1e12); past that the
    # scale path is the same sums in DECIMAL(38,0).
    kern = F.round(F.exp(-u * u / 2) * F.lit(1e12)).cast("long")
    import math

    # Loud overflow guard (ADVICE r07): Spark's non-ANSI sum(long)
    # silently WRAPS past ~9.2e18 while DuckDB promotes to HUGEINT, so
    # past ~9e6 fully-overlapping rows per grid point the engines would
    # silently diverge. assert_true rides inside the density expression
    # (NULL when the bound holds) so column pruning can never drop it;
    # past the bound the job fails with this message instead of lying.
    guard = F.assert_true(
        F.col("n") <= F.lit(9_000_000),
        F.lit(
            "gaussian_kde_grid: picounit BIGINT kernel sums overflow past "
            "~9e6 rows per grid point — switch to DECIMAL(38,0) accumulation"
        ),
    )
    dens = (
        base.crossJoin(F.broadcast(grid))
        .groupBy("gi", "gx", "n", "h")
        .agg((F.sum(kern).cast("double") / F.lit(1e12)).alias("ksum"))
        .select(
            F.col("gi").alias("grid_index"),
            F.round("gx", 2).alias("x"),
            F.when(
                guard.isNull(),
                F.round(
                    F.col("ksum")
                    / (F.col("n") * F.col("h") * F.lit(math.sqrt(2 * math.pi))),
                    12,
                ),
            ).alias("density"),
        )
    )
    return dens.orderBy("grid_index")
