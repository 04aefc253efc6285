"""Queries over the custom Python DataSources (sources/pyds.py).

Both are value-exact (full DuckDB oracle) even though the data never
touches parquet: the feed is the portable salted-sha256 arithmetic, so
the oracle regenerates it from `range(n)` — the correctness check thus
covers the CONNECTOR code path itself (partition planning, executor-side
generation, offset slicing), not just downstream operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.queries import register
from ocean_data_pipeline_spark.sources.pyds import register_python_sources

# Batch connector: feed size is tied to the sf (one feed row per events
# row) so the query scales with the dataset like every other registry
# entry; 8 planned partitions exercise parallel executor-side reads.
_FEED_EXPR = (
    "CAST(('0x' || substring(sha256('feed:' || CAST(CAST(i % 50 AS INT) AS VARCHAR)"
    " || ':' || CAST(CAST(i // 50 AS INT) AS VARCHAR)), 1, 6)) AS BIGINT) % 10000"
)

_ORACLE_FEED_PROFILE = f"""
WITH idx AS (
  -- DuckDB's range() takes only constants; derive the 0..n-1 index
  -- set from the events table itself (assignment order irrelevant —
  -- the index SET is what defines the feed).
  SELECT row_number() OVER (ORDER BY event_id) - 1 AS i FROM events
), feed AS (
  SELECT CAST(i % 50 AS INT) AS sensor_id,
         CAST(i // 50 AS INT) AS tick,
         CAST({_FEED_EXPR} AS INT) AS reading_centi
  FROM idx
)
SELECT sensor_id,
       count(*) AS n_ticks,
       CAST(sum(reading_centi) AS BIGINT) AS sum_centi,
       max(reading_centi) AS max_centi,
       min(reading_centi) AS min_centi
FROM feed
GROUP BY sensor_id
ORDER BY sensor_id
"""


@register("pyds_sensor_feed_profile", oracle=_ORACLE_FEED_PROFILE)
def pyds_sensor_feed_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor rollup read through the `ocean_sensor_feed` Python
    DataSource (8 InputPartitions, executor-side generation); the
    oracle regenerates the identical feed from range() arithmetic."""
    from ocean_data_pipeline_spark.catalog import table

    register_python_sources(spark)
    n_rows = table(spark, sf_dir, "events").count()
    feed = (
        spark.read.format("ocean_sensor_feed")
        .option("n_rows", n_rows)
        .option("n_parts", 8)
        .load()
    )
    return (
        feed.groupBy("sensor_id")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("reading_centi").cast("bigint").alias("sum_centi"),
            F.max("reading_centi").alias("max_centi"),
            F.min("reading_centi").alias("min_centi"),
        )
        .orderBy("sensor_id")
    )


# Streaming connector: fixed 2000-row feed in 500-row micro-batches
# through the memory sink; the aggregate is slicing-invariant (exact
# counts/sums of deterministic values), so a stateful streaming read
# from a CUSTOM PYTHON SOURCE carries a full oracle. Feed size is a
# constant (not sf-tied): the stream's determinism, not its volume, is
# what's under test.
_STREAM_ROWS = 2000

_ORACLE_STREAM_ROLLUP = f"""
WITH feed AS (
  SELECT CAST(i % 50 AS INT) AS sensor_id,
         CAST({_FEED_EXPR} AS INT) AS reading_centi
  FROM range({_STREAM_ROWS}) t(i)
)
SELECT sensor_id,
       count(*) AS n_readings,
       CAST(sum(reading_centi) AS BIGINT) AS sum_centi
FROM feed
GROUP BY sensor_id
ORDER BY sensor_id
"""


@register("pyds_stream_feed_rollup", oracle=_ORACLE_STREAM_ROLLUP)
def pyds_stream_feed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming aggregation over the `ocean_sensor_stream` Python
    source: 4 offset-sliced micro-batches → complete-mode counter
    state → memory sink; final state equals the batch oracle exactly
    because the feed is deterministic and the agg is merge-invariant."""
    import uuid

    register_python_sources(spark)
    stream = (
        spark.readStream.format("ocean_sensor_stream")
        .option("batch_rows", 500)
        .option("max_rows", _STREAM_ROWS)
        .load()
    )
    rollup = stream.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.sum("reading_centi").cast("bigint").alias("sum_centi"),
    )
    sink = f"pyds_stream_{uuid.uuid4().hex[:12]}"
    query = (
        rollup.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(sink).orderBy("sensor_id")
