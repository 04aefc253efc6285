"""Frequency-sketch operators in exact, engine-portable arithmetic
(SURVEY.md §2 sibling of `agg-approx`): a Count–Min sketch built with
deterministic multiplicative hashes, so — unlike the HLL/KLL built-ins
(`approx.py`, rows-only by necessity) — the sketch itself is
oracle-backed: DuckDB computes the IDENTICAL counter array and the
identical estimates, and the query reports the sketch's real
overcounts against exact truth.

Why this matters at 100 TB: a CMS update stream is a map-side
`(hash_i(key), +1)` per row — d·w counters of fixed size regardless of
key cardinality, mergeable across partitions by element-wise sum (the
same mergeable-state discipline as `incremental_agg_merge`). The query
below builds the counters FROM the per-key partial counts (one shuffle
on the key, counters derived by a second tiny agg), which is
plan-equivalent to updating counters directly and lets the same scan
also produce the exact truth to grade the sketch against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

#: Three pairwise-independent-enough multiplicative mixes (Knuth's
#: 2654435761 plus the xxHash/Murmur odd constants), identical BIGINT
#: arithmetic on both engines while key·mix < 2^63 (keys < ~2.8e9).
_MIXES = (2654435761, 2246822519, 3266489917)
_MOD = 4294967296  # 2^32
_W = 64            # counters per hash row
_TOPK = 20


def _bucket_sql(mix: int) -> str:
    return f"((o_custkey * {mix}) % {_MOD}) % {_W}"


_CMS_ORACLE = f"""
WITH k AS (
  SELECT o_custkey, count(*) AS exact_orders FROM orders GROUP BY o_custkey
),
h AS (
  SELECT o_custkey, exact_orders,
         {_bucket_sql(_MIXES[0])} AS b0,
         {_bucket_sql(_MIXES[1])} AS b1,
         {_bucket_sql(_MIXES[2])} AS b2
  FROM k
),
c0 AS (SELECT b0 AS b, sum(exact_orders) AS c FROM h GROUP BY b0),
c1 AS (SELECT b1 AS b, sum(exact_orders) AS c FROM h GROUP BY b1),
c2 AS (SELECT b2 AS b, sum(exact_orders) AS c FROM h GROUP BY b2)
SELECT h.o_custkey,
       CAST(h.exact_orders AS BIGINT) AS exact_orders,
       CAST(least(c0.c, c1.c, c2.c) AS BIGINT) AS cms_estimate,
       CAST(least(c0.c, c1.c, c2.c) - h.exact_orders AS BIGINT) AS overcount
FROM h
JOIN c0 ON c0.b = h.b0
JOIN c1 ON c1.b = h.b1
JOIN c2 ON c2.b = h.b2
ORDER BY h.exact_orders DESC, h.o_custkey
LIMIT {_TOPK}
"""


@register("countmin_heavy_hitters", oracle=_CMS_ORACLE)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–Min sketch (Cormode & Muthukrishnan, J.Alg'05) with d=3
    rows × w=64 counters over the order stream keyed by customer:
    estimate(key) = min_i counter_i[hash_i(key)], graded against the
    exact per-customer order count for the top-20 heaviest customers.
    `overcount >= 0` always (CMS error is one-sided); its magnitude
    here is the honest readout of a 64-wide sketch on this key
    distribution.

    Determinism: the hashes are exact BIGINT multiplicative mixes (same
    device as `shuffle_bucket_histogram`), so both engines build the
    IDENTICAL counter array — the sketch itself is oracle-verified, not
    just its contract.

    Plan shape: one shuffle keyed on o_custkey produces the exact
    counts; the three counter arrays are tiny (≤ 64 rows each) aggs
    over that keyed relation and come back as BROADCAST joins, so
    estimating costs no second fact-table pass; top-20 compiles to
    TakeOrderedAndProject. At stream scale the counters would instead
    accumulate map-side per partition and merge by element-wise sum —
    the mergeability the docstring header describes."""
    k = (
        table(spark, sf_dir, "orders")
        .select("o_custkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    h = k.select(
        "o_custkey",
        "exact_orders",
        *[
            ((F.col("o_custkey") * mix) % _MOD % _W).alias(f"b{i}")
            for i, mix in enumerate(_MIXES)
        ],
    ).localCheckpoint()  # consumed by 4 subtrees (3 counter aggs + probe)
    est = F.least(*[F.col(f"c{i}") for i in range(len(_MIXES))])
    out = h
    for i in range(len(_MIXES)):
        ci = F.broadcast(
            h.groupBy(F.col(f"b{i}").alias("b"))
            .agg(F.sum("exact_orders").alias(f"c{i}"))
            .withColumnRenamed("b", f"bb{i}")
        )
        out = out.join(ci, out[f"b{i}"] == ci[f"bb{i}"])
    return (
        out.select(
            "o_custkey",
            F.col("exact_orders").cast("bigint").alias("exact_orders"),
            est.cast("bigint").alias("cms_estimate"),
            (est - F.col("exact_orders")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("exact_orders"), F.asc("o_custkey"))
        .limit(_TOPK)
    )
