"""MERGE semantics (operators.merge) and the cache's bucket-scoped
upsert: writes must rewrite ONLY the key-prefix buckets they touch.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.cache.result_cache import CACHE_SCHEMA, ResultCache
from ocean_data_pipeline_spark.operators.merge import (
    merge_delete,
    merge_keep_latest,
    merge_upsert,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, ver long")


def test_merge_upsert_source_wins_and_inserts(spark):
    target = _df(spark, [("a", 1, 10), ("b", 2, 10)])
    source = _df(spark, [("b", 99, 5), ("c", 3, 5)])  # b older but still wins
    got = {r["k"]: (r["v"], r["ver"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {"a": (1, 10), "b": (99, 5), "c": (3, 5)}


def test_merge_keep_latest_is_replay_safe(spark):
    target = _df(spark, [("a", 1, 10), ("b", 2, 10)])
    stale_retry = _df(spark, [("b", 99, 5), ("c", 3, 5)])  # b stale -> loses
    got = {
        r["k"]: (r["v"], r["ver"])
        for r in merge_keep_latest(target, stale_retry, ["k"], "ver").collect()
    }
    assert got == {"a": (1, 10), "b": (2, 10), "c": (3, 5)}


def test_merge_delete_tombstones(spark):
    target = _df(spark, [("a", 1, 1), ("b", 2, 1), ("c", 3, 1)])
    tombstones = _df(spark, [("b", 0, 0), ("zz", 0, 0)])
    got = sorted(r["k"] for r in merge_delete(target, tombstones, ["k"]).collect())
    assert got == ["a", "c"]


def _entry(h: str, fetched: str):
    return (
        h, 30.0, -80.0, "1955-01-01", "1955-12-31", '["temperature"]',
        "[]", 0, fetched, "2100-01-01 00:00:00", 10,
    )


def _entries_df(spark, rows):
    df = spark.createDataFrame(
        [r[:8] + (r[8], r[9], r[10]) for r in rows],
        "query_hash string, latitude double, longitude double, start_date string, "
        "end_date string, variables string, data_json string, row_count long, "
        "fetched_s string, expires_s string, file_size_bytes long",
    )
    return df.select(
        "query_hash", "latitude", "longitude", "start_date", "end_date", "variables",
        "data_json", "row_count",
        F.col("fetched_s").cast("timestamp").alias("fetched_at"),
        F.col("expires_s").cast("timestamp").alias("expires_at"),
        "file_size_bytes",
    )


def _bucket_files(cache, bucket):
    return sorted(
        glob.glob(os.path.join(cache.path, "v_*", f"key_bucket={bucket}", "*.parquet"))
    )


def test_put_rewrites_only_touched_buckets(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "cache"))
    # seed two buckets: aa... and bb...
    cache.put(_entries_df(spark, [
        _entry("aa" + "0" * 14, "2024-01-01 00:00:00"),
        _entry("bb" + "0" * 14, "2024-01-01 00:00:00"),
    ]))
    aa_files = _bucket_files(cache, "aa")
    aa_mtimes = [os.path.getmtime(f) for f in aa_files]
    assert aa_files and _bucket_files(cache, "bb")

    # upsert into bb only: newer row must win; aa files must be untouched
    cache.put(_entries_df(spark, [_entry("bb" + "0" * 14, "2024-02-01 00:00:00")]))
    assert _bucket_files(cache, "aa") == aa_files
    assert [os.path.getmtime(f) for f in aa_files] == aa_mtimes

    rows = {r["query_hash"]: r for r in cache.read().collect()}
    assert len(rows) == 2
    assert rows["bb" + "0" * 14]["fetched_at"].isoformat() == "2024-02-01T00:00:00"


def test_put_empty_batch_is_noop(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "cache"))
    cache.put(spark.createDataFrame([], CACHE_SCHEMA))
    assert not os.path.exists(cache.path)


def test_put_writes_touched_set_once_and_vacuums(spark, tmp_path):
    """The commit writes each touched bucket into exactly ONE live
    version directory (no staging double-write) and vacuums superseded
    bucket dirs, so disk holds one copy of every bucket."""
    cache = ResultCache(spark, str(tmp_path / "cache"))
    cache.put(_entries_df(spark, [_entry("aa" + "0" * 14, "2024-01-01 00:00:00")]))
    cache.put(_entries_df(spark, [_entry("aa" + "0" * 14, "2024-02-01 00:00:00")]))
    aa_dirs = {
        os.path.dirname(f) for f in _bucket_files(cache, "aa")
    }
    assert len(aa_dirs) == 1  # superseded version vacuumed
    assert not glob.glob(os.path.join(cache.path, "*.tmp"))


def test_put_recovers_from_crashed_commit(spark, tmp_path):
    """A put that crashed AFTER writing its version dir but BEFORE the
    manifest flip leaves an unreferenced (orphan) version directory.
    Readers never see it; the next successful commit vacuums it."""
    cache = ResultCache(spark, str(tmp_path / "cache"))
    cache.put(_entries_df(spark, [_entry("aa" + "0" * 14, "2024-01-01 00:00:00")]))
    # simulate the crash: orphan version dir + stale manifest sidecar
    orphan = os.path.join(cache.path, "v_000099", "key_bucket=zz")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "orphan"), "w") as f:
        f.write("crash leftovers")
    with open(os.path.join(cache.path, "_manifest.json.tmp"), "w") as f:
        f.write("{half-written")

    # the orphan is invisible to reads (manifest is authoritative)
    assert {r["query_hash"] for r in cache.read().collect()} == {"aa" + "0" * 14}

    cache.put(_entries_df(spark, [_entry("bb" + "0" * 14, "2024-02-01 00:00:00")]))
    assert not os.path.exists(os.path.join(cache.path, "v_000099"))
    rows = {r["query_hash"] for r in cache.read().collect()}
    assert rows == {"aa" + "0" * 14, "bb" + "0" * 14}


def test_cleanup_and_clear_reclaim_space(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "cache"))
    cache.put(_entries_df(spark, [
        _entry("aa" + "0" * 14, "2024-01-01 00:00:00"),
        _entry("bb" + "0" * 14, "2024-01-01 00:00:00"),
    ]))
    # fixed "now" far in the future: everything expires
    removed = cache.cleanup(now=F.lit("2200-01-01").cast("timestamp"))
    assert removed == 2
    assert cache.read().count() == 0
    cache.clear()
    assert not glob.glob(os.path.join(cache.path, "v_*"))
    assert cache.read().count() == 0
