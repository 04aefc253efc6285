"""Flagship query: monthly time-series climatology summary.

The reference's core analytic — clean the raw series, bucket by month,
summarize each measure, return in time order (reference
dashboard/app.py:222-290 + pipeline/transform.py semantics, monthly
granularity config.py:37-42). Exercised on the `events` table (the
testdata's time-series fixture): per calendar month × event_type,
min/max/avg/count of `value`.

Scale notes: single hash-aggregate with map-side partial aggregation;
grouping keys are low-cardinality (months × types), so the shuffle is
tiny regardless of input size. Scan is parquet with column pruning to
(ts, event_type, value). No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

_ORACLE = """
SELECT
  date_trunc('month', ts)                       AS month,
  event_type,
  count(*)                                      AS n_events,
  count(value)                                  AS n_values,
  round(min(value), 3)                          AS min_value,
  round(max(value), 3)                          AS max_value,
  round(avg(value), 3)                          AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("monthly_series", oracle=_ORACLE)
def monthly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg-groupby + agg-minmax/mean/count + sort-time in one pipeline."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("month", F.col("ts")).alias("month"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("value").alias("n_values"),
            F.round(F.min("value"), 3).alias("min_value"),
            F.round(F.max("value"), 3).alias("max_value"),
            F.round(F.avg("value"), 3).alias("avg_value"),
        )
        .orderBy("month", "event_type")
    )
