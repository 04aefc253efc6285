"""Keyed TTL result cache (SURVEY.md §2-A src-cache/sink-cache, §4;
reference cache_manager.py).

The reference caches query results in SQLite keyed by a SHA-256 of
normalized parameters, with 24 h TTL, a 100 MB admission guard, upsert
(INSERT OR REPLACE), expired-row cleanup, stats aggregates, and a
nearby-coordinates range lookup (cache_manager.py:34-337). Here the
cache is an ordinary parquet table and every operation is a DataFrame
transformation:

- lookup   = TTL-filtered broadcast semi/inner join on the key
- upsert   = unionByName + keep-latest window dedup + atomic bucket swap
- cleanup  = liveness filter rewrite (delete-pred as anti-filter)
- stats    = conditional aggregates
- nearby   = bounded-radius θ-join (operators.joins.nearby_join)

Storage layout — versioned buckets behind a manifest (a minimal
commit log, the pattern Delta/Iceberg generalize):

    <path>/_manifest.json        {"buckets": {"ab": "v_000007", ...}}
    <path>/v_000007/key_bucket=ab/part-*.parquet
    <path>/v_000007/key_bucket=cd/part-*.parquet

A commit writes the merged TOUCHED buckets into a fresh `v_NNNNNN`
directory (ONE write of the write set — no staging+overwrite double
write), then atomically flips the manifest via os.replace. A crash
before the flip leaves an unreferenced version directory (garbage,
removed by the next commit's vacuum) and the table stays authoritative
at the previous manifest — readers never observe a partial commit.

Scale posture: the key space is bucketed by a 2-hex-char prefix (256
buckets) so point lookups read exactly one bucket directory and upserts
rewrite only touched buckets — cost follows the WRITE SET, not the
table size (the parquet analog of the reference's B-tree index on
query_hash, cache_manager.py:51-53).

Deployment contract: `path` must be a LOCAL filesystem path — the
manifest flip (os.replace) and vacuum (os.listdir/shutil.rmtree) are
local-FS operations. On an object store or HDFS, use a real table
format with a commit log (Delta/Iceberg) instead; this class is the
single-node/NFS twin of that design.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.merge import merge_keep_latest

#: Reference config.py:58-63.
DEFAULT_TTL_HOURS = 24
MAX_ENTRY_BYTES = 100 * 1024 * 1024  # admission guard, cache_manager.py:148-150

MANIFEST = "_manifest.json"

CACHE_SCHEMA = (
    "query_hash string, latitude double, longitude double, "
    "start_date string, end_date string, variables string, "
    "data_json string, row_count long, fetched_at timestamp, "
    "expires_at timestamp, file_size_bytes long"
)


@dataclass
class ResultCache:
    """Parquet-backed keyed TTL cache with atomic manifest commits."""

    spark: SparkSession
    path: str
    ttl_hours: int = DEFAULT_TTL_HOURS

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], CACHE_SCHEMA)

    # -- manifest (the commit log) -------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def _read_manifest(self) -> dict[str, str]:
        """bucket (2-hex prefix) -> version dir currently holding it."""
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)["buckets"]
        except FileNotFoundError:
            return {}

    def _write_manifest(self, buckets: dict[str, str]) -> None:
        """Atomic flip: write sidecar, fsync, os.replace (POSIX-atomic).
        Readers see either the old or the new manifest, never a blend."""
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"buckets": buckets}, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())

    def _next_version(self) -> str:
        """Monotonic version id; tolerates malformed/orphan dir names."""
        nums = []
        if os.path.exists(self.path):
            for d in os.listdir(self.path):
                if d.startswith("v_"):
                    try:
                        nums.append(int(d[2:]))
                    except ValueError:
                        pass
        return f"v_{max(nums, default=0) + 1:06d}"

    def _vacuum(self, manifest: dict[str, str]) -> None:
        """Remove bucket dirs (and whole version dirs) the manifest no
        longer references: superseded buckets and crash orphans. Safe to
        run any time — never touches referenced data."""
        live = {(v, f"key_bucket={b}") for b, v in manifest.items()}
        live_versions = {v for v, _ in live}
        for d in os.listdir(self.path):
            if not d.startswith("v_"):
                continue
            vdir = os.path.join(self.path, d)
            if d not in live_versions:
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            for sub in os.listdir(vdir):
                if sub.startswith("key_bucket=") and (d, sub) not in live:
                    shutil.rmtree(os.path.join(vdir, sub), ignore_errors=True)

    def _read_buckets(self, manifest: dict[str, str], buckets) -> DataFrame:
        """Scan exactly the requested buckets' current directories.

        The bucket id is directory metadata, not a data column, so no
        partition-column drop is needed; the explicit schema keeps the
        scan footer-merge-free."""
        dirs = [
            os.path.join(self.path, manifest[b], f"key_bucket={b}")
            for b in sorted(set(buckets))
            if b in manifest
        ]
        if not dirs:
            return self._empty()
        return self.spark.read.schema(CACHE_SCHEMA).parquet(*dirs)

    # -- read path -----------------------------------------------------

    def read(self) -> DataFrame:
        manifest = self._read_manifest()
        if not manifest:
            return self._empty()
        return self._read_buckets(manifest, manifest.keys())

    def live(self, now: F.Column | None = None) -> DataFrame:
        """TTL liveness view (expires_at > now); cache_manager.py:94-95."""
        now = F.current_timestamp() if now is None else now
        return self.read().filter(F.col("expires_at") > now)

    def get(self, query_hash: str, now: F.Column | None = None) -> DataFrame:
        """Point lookup by key — reads ONE bucket directory (manifest
        pruning), then filters within it."""
        now = F.current_timestamp() if now is None else now
        manifest = self._read_manifest()
        return (
            self._read_buckets(manifest, [query_hash[:2]])
            .filter(F.col("query_hash") == query_hash)
            .filter(F.col("expires_at") > now)
        )

    def lookup(self, probes: DataFrame, now: F.Column | None = None) -> DataFrame:
        """Batch lookup: prune to the probed buckets (≤256, driver-side
        metadata), then broadcast the probe keys and inner-join."""
        now = F.current_timestamp() if now is None else now
        buckets = [
            r["b"]
            for r in probes.select(
                F.substring("query_hash", 1, 2).alias("b")
            ).distinct().collect()
        ]
        manifest = self._read_manifest()
        return (
            self._read_buckets(manifest, buckets)
            .filter(F.col("expires_at") > now)
            .join(F.broadcast(probes.select("query_hash")), "query_hash", "inner")
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

    # -- write path ----------------------------------------------------

    def put(self, entries: DataFrame) -> None:
        """Upsert entries (keyed by query_hash), keeping the latest
        fetched_at per key — the distributed INSERT OR REPLACE
        (reference cache_manager.py:153-157), as a bucket-scoped MERGE
        (operators.merge.merge_keep_latest). Oversized payloads are
        admission-rejected (cache_manager.py:148-150).

        Commit protocol: merge the touched buckets' current data with
        the incoming rows, write the result ONCE into a fresh version
        directory, flip the manifest atomically, vacuum superseded
        dirs. Untouched buckets are never read or rewritten; a crash at
        any point leaves the previous manifest authoritative."""
        admitted = entries.filter(F.col("file_size_bytes") <= MAX_ENTRY_BYTES)
        buckets = [
            r["key_bucket"]
            for r in admitted.select(
                F.substring("query_hash", 1, 2).alias("key_bucket")
            ).distinct().collect()
        ]
        if not buckets:
            return
        manifest = self._read_manifest()
        existing = self._read_buckets(manifest, buckets)
        deduped = merge_keep_latest(existing, admitted, ["query_hash"], "fetched_at")
        out = deduped.withColumn("key_bucket", F.substring("query_hash", 1, 2))
        version = self._next_version()
        out.write.mode("overwrite").partitionBy("key_bucket").parquet(
            os.path.join(self.path, version)
        )
        new_manifest = {**manifest, **{b: version for b in buckets}}
        self._write_manifest(new_manifest)
        self._vacuum(new_manifest)

    # -- maintenance ---------------------------------------------------

    def cleanup(self, now: F.Column | None = None) -> int:
        """Drop expired rows; returns number removed
        (cache_manager.py:179-196). Rewrite-as-filter, no row deletes;
        same commit protocol as put (write survivors once, flip)."""
        now = F.current_timestamp() if now is None else now
        manifest = self._read_manifest()
        if not manifest:
            return 0
        df = self._read_buckets(manifest, manifest.keys())
        before = df.count()
        kept = df.filter(F.col("expires_at") > now).withColumn(
            "key_bucket", F.substring("query_hash", 1, 2)
        )
        version = self._next_version()
        kept.write.mode("overwrite").partitionBy("key_bucket").parquet(
            os.path.join(self.path, version)
        )
        kept_buckets = [
            r["key_bucket"] for r in kept.select("key_bucket").distinct().collect()
        ]
        new_manifest = {b: version for b in kept_buckets}
        self._write_manifest(new_manifest)
        self._vacuum(new_manifest)
        return before - self.read().count()

    def clear(self) -> None:
        """Full clear (cache_manager.py:283-293): empty manifest flip,
        vacuum reclaims every version directory."""
        os.makedirs(self.path, exist_ok=True)
        self._write_manifest({})
        self._vacuum({})

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
