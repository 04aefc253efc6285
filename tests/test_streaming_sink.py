"""foreachBatch cache-sink test (SURVEY.md §2-H ◇stream-refresh):
micro-batches upsert into the parquet ResultCache with keep-latest
semantics surviving across batches and stream restarts.
"""

from __future__ import annotations

import datetime as dt

from ocean_data_pipeline_spark.cache.result_cache import CACHE_SCHEMA, ResultCache
from ocean_data_pipeline_spark.streaming.sink import stream_into_cache


def _entry(key: str, fetched: str, payload: str):
    f = dt.datetime.fromisoformat(fetched)
    return (
        key, 23.5, -72.75, "1955-01-01", "1960-12-31", '["temperature"]',
        payload, 1, f, f + dt.timedelta(hours=24), len(payload),
    )


def _run_once(spark, src_dir, cache, ckpt):
    stream = spark.readStream.schema(CACHE_SCHEMA).parquet(src_dir)
    q = stream_into_cache(stream, cache, ckpt, refresh_interval="0 seconds")
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_upsert_keep_latest(spark, tmp_path):
    src = str(tmp_path / "entries")
    ckpt = str(tmp_path / "ckpt")
    cache = ResultCache(spark, str(tmp_path / "cache"))

    batch1 = spark.createDataFrame(
        [_entry("aa11", "2024-01-01T00:00:00", '[{"v":1}]'),
         _entry("bb22", "2024-01-01T00:00:00", '[{"v":2}]')],
        CACHE_SCHEMA,
    )
    batch1.write.mode("append").parquet(src)
    _run_once(spark, src, cache, ckpt)
    assert cache.read().count() == 2

    # newer write for aa11 arrives in a later micro-batch -> replaces
    batch2 = spark.createDataFrame(
        [_entry("aa11", "2024-06-01T00:00:00", '[{"v":9}]')], CACHE_SCHEMA
    )
    batch2.write.mode("append").parquet(src)
    _run_once(spark, src, cache, ckpt)  # restart from checkpoint: only new file processed

    rows = {r["query_hash"]: r for r in cache.read().collect()}
    assert set(rows) == {"aa11", "bb22"}
    assert rows["aa11"]["data_json"] == '[{"v":9}]'
    assert rows["aa11"]["fetched_at"] == dt.datetime(2024, 6, 1)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Failure-recovery contract: foreachBatch may REPLAY a batch after
    a crash between put() and checkpoint commit; the keep-latest keyed
    upsert makes the replay a no-op, so at-least-once delivery + an
    idempotent sink = exactly-once table state."""
    cache = ResultCache(spark, str(tmp_path / "cache"))
    batch = spark.createDataFrame(
        [_entry("aa11", "2024-01-01T00:00:00", '[{"v":1}]')], CACHE_SCHEMA
    )
    writer = __import__(
        "ocean_data_pipeline_spark.streaming.sink", fromlist=["cache_upsert_writer"]
    ).cache_upsert_writer(cache)
    writer(batch, batch_id=7)
    state1 = sorted(map(tuple, cache.read().collect()))
    writer(batch, batch_id=7)  # replay
    state2 = sorted(map(tuple, cache.read().collect()))
    assert state1 == state2 and len(state1) == 1
