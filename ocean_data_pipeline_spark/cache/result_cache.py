"""Keyed TTL result cache (SURVEY.md §2-A src-cache/sink-cache, §4;
reference cache_manager.py).

The reference caches query results in SQLite keyed by a SHA-256 of
normalized parameters, with 24 h TTL, a 100 MB admission guard, upsert
(INSERT OR REPLACE), expired-row cleanup, stats aggregates, and a
nearby-coordinates range lookup (cache_manager.py:34-337). Here the
cache is an ordinary parquet table and every operation is a DataFrame
transformation:

- lookup   = TTL-filtered broadcast semi/inner join on the key
- upsert   = unionByName + keep-latest window dedup + partition overwrite
- cleanup  = liveness filter rewrite (delete-pred as anti-filter)
- stats    = conditional aggregates
- nearby   = bounded-radius θ-join (operators.joins.nearby_join)

Scale posture: the table is partitioned by a 2-hex-char key prefix
(256 buckets) so point lookups prune to one partition and upserts
rewrite only touched partitions — the parquet analog of the reference's
B-tree index on query_hash (cache_manager.py:51-53).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.merge import merge_keep_latest

#: Reference config.py:58-63.
DEFAULT_TTL_HOURS = 24
MAX_ENTRY_BYTES = 100 * 1024 * 1024  # admission guard, cache_manager.py:148-150

CACHE_SCHEMA = (
    "query_hash string, latitude double, longitude double, "
    "start_date string, end_date string, variables string, "
    "data_json string, row_count long, fetched_at timestamp, "
    "expires_at timestamp, file_size_bytes long"
)


@dataclass
class ResultCache:
    """Parquet-backed keyed TTL cache."""

    spark: SparkSession
    path: str
    ttl_hours: int = DEFAULT_TTL_HOURS

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], CACHE_SCHEMA)

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self._empty()
        df = self.spark.read.parquet(self.path)
        # The on-disk layout's partition column is storage detail, not
        # cache schema — leaking it breaks the upsert's unionByName once
        # the table exists.
        return df.drop("key_bucket") if "key_bucket" in df.columns else df

    # -- write path ----------------------------------------------------

    def put(self, entries: DataFrame) -> None:
        """Upsert entries (keyed by query_hash), keeping the latest
        fetched_at per key — the distributed INSERT OR REPLACE
        (reference cache_manager.py:153-157), as a bucket-scoped MERGE
        (operators.merge.merge_keep_latest). Oversized payloads are
        admission-rejected (cache_manager.py:148-150).

        Scale contract: only the key-prefix buckets that the incoming
        keys touch are read and rewritten (dynamic partition overwrite)
        — upsert cost follows the WRITE SET, not the table size. The
        bucket list is driver-side metadata (≤256 two-hex values), the
        parquet analog of Delta's file-pruning pass."""
        admitted = entries.filter(F.col("file_size_bytes") <= MAX_ENTRY_BYTES)
        buckets = [
            r["key_bucket"]
            for r in admitted.select(
                F.substring("query_hash", 1, 2).alias("key_bucket")
            ).distinct().collect()
        ]
        if not buckets:
            return
        if os.path.exists(self.path):
            # filter on the PARTITION column pre-drop: this is the scan
            # that partition-prunes to the touched bucket directories
            existing = (
                self.spark.read.parquet(self.path)
                .filter(F.col("key_bucket").isin(buckets))
                .drop("key_bucket")
            )
        else:
            existing = self._empty()
        deduped = merge_keep_latest(existing, admitted, ["query_hash"], "fetched_at")
        out = deduped.withColumn("key_bucket", F.substring("query_hash", 1, 2))
        # stage touched buckets, then dynamic-overwrite ONLY those
        # partitions (untouched bucket directories are left untouched)
        tmp = self.path + ".tmp"
        out.write.mode("overwrite").partitionBy("key_bucket").parquet(tmp)
        try:
            self.spark.read.parquet(tmp).write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("key_bucket").parquet(self.path)
        finally:
            # The staging dir is commit-scoped scratch: remove it even
            # when the commit write raises, so a crashed put leaves the
            # table directory authoritative and no orphan .tmp behind.
            # (A fresh put never reads .tmp — mode("overwrite") above
            # replaces it wholesale — so cleanup is purely hygiene; the
            # real upgrade path for transactional upserts is a table
            # format with a commit log: Delta/Iceberg.)
            shutil.rmtree(tmp, ignore_errors=True)

    # -- read path -----------------------------------------------------

    def live(self, now: F.Column | None = None) -> DataFrame:
        """TTL liveness view (expires_at > now); cache_manager.py:94-95."""
        now = F.current_timestamp() if now is None else now
        return self.read().filter(F.col("expires_at") > now)

    def get(self, query_hash: str, now: F.Column | None = None) -> DataFrame:
        """Point lookup by key — partition-pruned scan + filter."""
        return self.live(now).filter(F.col("query_hash") == query_hash)

    def lookup(self, probes: DataFrame, now: F.Column | None = None) -> DataFrame:
        """Batch lookup: broadcast the probe keys, semi-join the cache."""
        return self.live(now).join(
            F.broadcast(probes.select("query_hash")), "query_hash", "inner"
        )

    def nearby(
        self, lat: float, lon: float, radius: float, now: F.Column | None = None
    ) -> DataFrame:
        """Range lookup ordered nearest-first (cache_manager.py:295-337)."""
        live = self.live(now)
        d_lat = F.abs(F.col("latitude") - F.lit(lat))
        d_lon = F.abs(F.col("longitude") - F.lit(lon))
        return (
            live.filter((d_lat < radius) & (d_lon < radius))
            .withColumn("l1_distance", d_lat + d_lon)
            .withColumn(
                "l2_distance",
                F.sqrt(
                    F.pow(F.col("latitude") - F.lit(lat), 2)
                    + F.pow(F.col("longitude") - F.lit(lon), 2)
                ),
            )
            .orderBy("l1_distance", "query_hash")
        )

    # -- maintenance ---------------------------------------------------

    def cleanup(self, now: F.Column | None = None) -> int:
        """Drop expired rows; returns number removed
        (cache_manager.py:179-196). Rewrite-as-filter, no row deletes."""
        now = F.current_timestamp() if now is None else now
        df = self.read()
        before = df.count()
        kept = df.filter(F.col("expires_at") > now)
        tmp = self.path + ".tmp"
        kept.withColumn("key_bucket", F.substring("query_hash", 1, 2)).write.mode(
            "overwrite"
        ).partitionBy("key_bucket").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").partitionBy("key_bucket").parquet(self.path)
        return before - self.read().count()

    def clear(self) -> None:
        """Full clear (cache_manager.py:283-293)."""
        self._empty().withColumn("key_bucket", F.substring("query_hash", 1, 2)).write.mode(
            "overwrite"
        ).partitionBy("key_bucket").parquet(self.path)

    def stats(self, now: F.Column | None = None) -> DataFrame:
        """Cache stats: total/active/expired counts, bytes, age extremes
        (cache_manager.py:199-227) — one conditional-aggregate pass."""
        now = F.current_timestamp() if now is None else now
        df = self.read()
        active = F.when(F.col("expires_at") > now, F.lit(1))
        return df.agg(
            F.count(F.lit(1)).alias("total_entries"),
            F.count(active).alias("active_entries"),
            (F.count(F.lit(1)) - F.count(active)).alias("expired_entries"),
            F.sum("file_size_bytes").alias("total_bytes"),
            F.min("fetched_at").alias("oldest_fetch"),
            F.max("fetched_at").alias("newest_fetch"),
        )
