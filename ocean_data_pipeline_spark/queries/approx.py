"""Approximate/sketch aggregates — the 100 TB twins of the exact
queries (SURVEY.md §2-D agg-groupby scale notes; PLANS.md).

Exact `count(DISTINCT)` shuffles every distinct value; exact
`percentile` sort-aggregates the column. At cluster scale those become
HyperLogLog++ (`approx_count_distinct`, mergeable fixed-size sketches)
and KLL/GK quantile sketches (`percentile_approx`). Sketch internals
differ across engines, so there is no DuckDB hash-oracle; instead the
queries() entries are rows-only and `tests/test_approx.py` bounds the
error against the EXACT twins (which are themselves oracle-checked:
distinct_counts, quartiles_exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register


@register("approx_distinct_counts", oracle=None)
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinalities (rsd 2%) for the distinct_counts twin —
    constant memory per partial, one tiny merge instead of a
    distinct-value shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_suppliers"),
    )


@register("approx_quartiles", oracle=None)
def approx_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (accuracy 10000) for the quartiles_exact twin —
    mergeable sketch vs the exact sort-based aggregate."""
    li = table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000)
    return li.agg(
        q.getItem(0).alias("p25"), q.getItem(1).alias("p50"), q.getItem(2).alias("p75")
    )
