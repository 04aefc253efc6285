"""Cache/state-layer semantics as oracle-checked queries (SURVEY.md
§2-A ◇src-cache/◇sink-cache + §2-E dedup-key/delete-pred, Phase 3).

The driver can't watch us write tables, so the cache relation is DERIVED
deterministically inside each query (a two-generation cache built from
orders: one stale generation, one fresh), and the cache semantics —
keep-latest upsert, TTL liveness, conditional stats, key lookup — are
applied on top. The writable-table twin lives in cache/result_cache.py
and is exercised by unit tests.

Fixed "now" = 1999-01-01 so liveness is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# Derived cache relation: one entry per (custkey%500) key-group and
# generation; fetched_at = group's min/max order date (gen 0/1);
# expires_at = fetched_at + 24 h.
_CACHE_CTE = """
WITH base AS (
  SELECT o_custkey % 500 AS key_id,
         min(o_orderdate) AS d0,
         max(o_orderdate) AS d1,
         count(*)         AS row_count,
         CAST(sum(length(o_orderstatus)) AS BIGINT) AS file_size_bytes
  FROM orders GROUP BY 1
), cache AS (
  SELECT substr(sha256(concat('key_', key_id)), 1, 16) AS query_hash,
         key_id, d0 AS fetched_at, d0 + INTERVAL 24 HOUR AS expires_at,
         row_count, file_size_bytes
  FROM base
  UNION ALL
  SELECT substr(sha256(concat('key_', key_id)), 1, 16) AS query_hash,
         key_id, d1 AS fetched_at, d1 + INTERVAL 24 HOUR AS expires_at,
         row_count, file_size_bytes
  FROM base
)
"""


def _cache_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    base = o.groupBy((F.col("o_custkey") % 500).alias("key_id")).agg(
        F.min("o_orderdate").alias("d0"),
        F.max("o_orderdate").alias("d1"),
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.length("o_orderstatus")).alias("file_size_bytes"),
    )
    key = F.substring(F.sha2(F.concat(F.lit("key_"), F.col("key_id")), 256), 1, 16)
    gen = lambda d: base.select(  # noqa: E731
        key.alias("query_hash"),
        "key_id",
        F.col(d).alias("fetched_at"),
        (F.col(d) + F.expr("INTERVAL 24 HOURS")).alias("expires_at"),
        "row_count",
        "file_size_bytes",
    )
    return gen("d0").unionByName(gen("d1"))


_UPSERT_ORACLE = (
    _CACHE_CTE
    + """
SELECT query_hash, key_id, fetched_at, row_count
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_hash
                               ORDER BY fetched_at DESC) AS rn
  FROM cache
)
WHERE rn = 1
ORDER BY key_id
"""
)


@register("cache_upsert_keep_latest", oracle=_UPSERT_ORACLE)
def cache_upsert_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup-key keep-latest: the INSERT OR REPLACE semantics
    (reference cache_manager.py:153-157) as a row_number window."""
    cache = _cache_df(spark, sf_dir)
    w = Window.partitionBy("query_hash").orderBy(F.desc("fetched_at"))
    return (
        cache.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_hash", "key_id", "fetched_at", "row_count")
        .orderBy("key_id")
    )


_STATS_ORACLE = (
    _CACHE_CTE
    + """
SELECT
  count(*) AS total_entries,
  count(CASE WHEN expires_at > TIMESTAMP '1999-01-01' THEN 1 END) AS active_entries,
  count(*) - count(CASE WHEN expires_at > TIMESTAMP '1999-01-01' THEN 1 END) AS expired_entries,
  CAST(sum(file_size_bytes) AS BIGINT) AS total_bytes,
  min(fetched_at) AS oldest_fetch,
  max(fetched_at) AS newest_fetch,
  datediff('day', min(fetched_at), max(fetched_at)) AS span_days
FROM cache
"""
)


@register("cache_ttl_stats", oracle=_STATS_ORACLE)
def cache_ttl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg-conditional cache stats at fixed now (cache_manager.py:199-227)."""
    cache = _cache_df(spark, sf_dir)
    now = F.lit("1999-01-01").cast("timestamp")
    active = F.when(F.col("expires_at") > now, F.lit(1))
    return cache.agg(
        F.count(F.lit(1)).alias("total_entries"),
        F.count(active).alias("active_entries"),
        (F.count(F.lit(1)) - F.count(active)).alias("expired_entries"),
        F.sum("file_size_bytes").alias("total_bytes"),
        F.min("fetched_at").alias("oldest_fetch"),
        F.max("fetched_at").alias("newest_fetch"),
        # fn-datediff-days: the reference's time-span metric
        # (dashboard/app.py:323-324) over the cache's fetch window.
        F.datediff(F.max("fetched_at"), F.min("fetched_at")).alias("span_days"),
    )


_LOOKUP_ORACLE = (
    _CACHE_CTE
    + """
SELECT query_hash, key_id, fetched_at, row_count
FROM cache
WHERE query_hash = substr(sha256('key_42'), 1, 16)
  AND expires_at > TIMESTAMP '1997-01-01'
ORDER BY fetched_at
"""
)


@register("cache_key_lookup", oracle=_LOOKUP_ORACLE)
def cache_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-key-lookup: TTL-filtered point probe by hash — the filter
    prunes to one key-bucket partition in the materialized layout."""
    cache = _cache_df(spark, sf_dir)
    probe_hash = F.substring(F.sha2(F.lit("key_42"), 256), 1, 16)
    now = F.lit("1997-01-01").cast("timestamp")
    return (
        cache.filter((F.col("query_hash") == probe_hash) & (F.col("expires_at") > now))
        .select("query_hash", "key_id", "fetched_at", "row_count")
        .orderBy("fetched_at")
    )


_CLEANUP_ORACLE = (
    _CACHE_CTE
    + """
SELECT
  count(*) AS entries_before,
  count(CASE WHEN expires_at >= TIMESTAMP '1999-01-01' THEN 1 END) AS entries_after,
  count(CASE WHEN expires_at < TIMESTAMP '1999-01-01' THEN 1 END) AS entries_deleted
FROM cache
"""
)


@register("cache_cleanup_expired", oracle=_CLEANUP_ORACLE)
def cache_cleanup_expired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delete-pred as liveness-filter rewrite + deleted-count report
    (cache_manager.py:179-196)."""
    cache = _cache_df(spark, sf_dir)
    now = F.lit("1999-01-01").cast("timestamp")
    expired = F.when(F.col("expires_at") < now, F.lit(1))
    live = F.when(F.col("expires_at") >= now, F.lit(1))
    return cache.agg(
        F.count(F.lit(1)).alias("entries_before"),
        F.count(live).alias("entries_after"),
        F.count(expired).alias("entries_deleted"),
    )
