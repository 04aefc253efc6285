"""Streaming execution tests (SURVEY.md §2-H): the same window builders
that pass the batch oracle must produce identical results when run as a
Structured Streaming job; TTL state and watermark dedup behave.

Pattern: write events to a parquet dir, readStream over it, memory
sink, processAllAvailable() — a complete synchronous micro-batch run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.streaming.ttl import dedup_within_watermark, ttl_latest_state
from ocean_data_pipeline_spark.streaming.windows import tumbling_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events with µs timestamps staged as a streamable parquet dir."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, SF, "events").write.mode("overwrite").parquet(d)
    return d


def _run_stream(df, name: str, mode: str = "complete"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _run_stream_until(spark, df, name: str, mode: str, predicate, timeout_s: int = 120):
    """Run a stream until `predicate(sink_rows)` holds, then stop.

    Needed for stateful ops with processing-time timeouts
    (ttl_latest_state): the engine keeps firing "no new data but
    cleaning up state" micro-batches to check timers, so neither
    `processAllAvailable()` nor an availableNow trigger ever
    terminates the query — termination is the *caller's* decision,
    exactly as it would be in production (these are long-running jobs).
    """
    import time

    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if predicate(rows):
                return rows
            time.sleep(1)
        raise AssertionError(f"stream {name} never satisfied predicate; last rows: {rows}")
    finally:
        q.stop()


def test_tumbling_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    _run_stream(tumbling_counts(stream), "tumbling_out")
    got = spark.sql(
        "SELECT window_start, event_type, n_events, sum_value FROM tumbling_out"
    ).collect()
    want = tumbling_counts(batch).select(
        "window_start", "event_type", "n_events", "sum_value"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_dedup_within_watermark(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:05:00", 2.0),  # dup key within watermark -> dropped
            (2, "2024-01-01 00:01:00", 3.0),
        ],
        "event_id long, ts_s string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    d = str(tmp_path / "dup_events")
    src.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(src.schema).parquet(d)
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    _run_stream(deduped, "dedup_out", mode="append")
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_ttl_latest_state(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (100, "2024-01-01 00:00:00", 1.5),
            (100, "2024-01-01 00:10:00", 2.5),  # later value wins
            (200, "2024-01-01 00:01:00", 9.0),
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    d = str(tmp_path / "state_events")
    src.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(src.schema).parquet(d)
    got = _run_stream_until(
        spark,
        ttl_latest_state(stream, ttl_ms=3_600_000),
        "ttl_out",
        mode="update",
        predicate=lambda rs: {r["user_id"] for r in rs} == {100, 200},
    )
    rows = {r["user_id"]: r for r in got}
    assert rows[100]["n_seen"] == 2 and rows[100]["latest_value"] == 2.5
    assert rows[200]["n_seen"] == 1 and rows[200]["latest_value"] == 9.0
    assert not rows[100]["expired"] and not rows[200]["expired"]


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving behind the watermark is excluded from its
    (already-finalized) window: batch 1 advances the watermark past
    window [00:00, 01:00); batch 2 delivers a late 00:20 event, which
    must NOT bump that window's count. The same data in batch mode
    counts it — the difference IS the late-data policy."""
    src = str(tmp_path / "late_events")
    schema = "event_id long, ts_s string, event_type string, value double"

    def _write(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
        ).write.mode("append").parquet(src)

    # batch 1: one event in the 00:00 window; one at 02:00 that pushes
    # the 10-minute watermark to 01:50 (past the window end 01:00)
    _write([(1, "2024-01-01 00:05:00", "view", 1.0),
            (2, "2024-01-01 02:00:00", "view", 1.0)])
    batch_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(batch_schema).parquet(src)
    windowed = tumbling_counts(stream, window_len="1 hour", watermark="10 minutes")
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: 00:20 is now behind the 01:50 watermark -> dropped
        _write([(3, "2024-01-01 00:20:00", "view", 1.0),
                (4, "2024-01-01 02:10:00", "view", 1.0)])
        q.processAllAvailable()
        rows = {
            (r["window_start"].isoformat(), r["event_type"]): r["n_events"]
            for r in spark.sql("SELECT * FROM late_out").collect()
        }
    finally:
        q.stop()
    assert rows[("2024-01-01T00:00:00", "view")] == 1  # late event excluded
    # same data through the batch path counts the late event: 2
    batch_counts = {
        (r["window_start"].isoformat(), r["event_type"]): r["n_events"]
        for r in tumbling_counts(
            spark.read.parquet(src), window_len="1 hour", watermark="10 minutes"
        ).collect()
    }
    assert batch_counts[("2024-01-01T00:00:00", "view")] == 2


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Stream-stream inner join (view→purchase attribution within 1 h):
    the streaming run over the same events must emit exactly the batch
    twin's pairs. Both sides watermarked; the time-bound condition is
    what lets the engine bound join state."""
    from ocean_data_pipeline_spark.streaming.joins import view_purchase_conversions

    batch = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "purchase"),
        )

    _run_stream(
        view_purchase_conversions(*split(stream)), "ss_join_out", mode="append"
    )
    got = spark.sql(
        "SELECT user_id, view_ts, purchase_ts, delay_sec FROM ss_join_out"
    ).collect()
    want = view_purchase_conversions(*split(batch)).select(
        "user_id", "view_ts", "purchase_ts", "delay_sec"
    ).collect()
    assert len(want) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_stream_outer_join_emits_unmatched_at_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: a view with no purchase must be
    emitted with NULL purchase columns — but only once the watermark
    passes view_ts + horizon (before that, a future purchase could
    still match). Events past 02:10 push the 1 h-delay watermark beyond
    00:05 + 1 h, releasing user 1's unconverted view."""
    import time

    from ocean_data_pipeline_spark.streaming.joins import view_purchase_conversions

    src = str(tmp_path / "funnel_events")
    schema = "event_id long, ts_s string, user_id long, event_type string, value double"

    def _write(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value",
        ).write.mode("append").parquet(src)

    # u1: view, never purchases. u2: view then purchase in-horizon.
    _write([(1, "2024-01-01 00:05:00", 1, "view", 0.0),
            (2, "2024-01-01 00:10:00", 2, "view", 0.0),
            (3, "2024-01-01 00:30:00", 2, "purchase", 9.5)])
    batch_schema = spark.read.parquet(src).schema

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = spark.readStream.schema(batch_schema).parquet(src)
    joined = view_purchase_conversions(*split(stream), how="left_outer")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("outer_join_out")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        early = spark.sql(
            "SELECT * FROM outer_join_out WHERE purchase_ts IS NULL"
        ).collect()
        assert early == []  # outer row must NOT leak before the watermark
        # advance both sides' watermarks past 00:05 + 1h horizon + 1h delay
        _write([(4, "2024-01-01 03:00:00", 9, "view", 0.0),
                (5, "2024-01-01 03:00:00", 9, "purchase", 1.0)])
        q.processAllAvailable()
        # state eviction can land in a later micro-batch than the data:
        # nudge with empty-ish batches until the outer row appears
        deadline = time.monotonic() + 60
        nulls = []
        nudge = 6
        while time.monotonic() < deadline:
            nulls = spark.sql(
                "SELECT user_id FROM outer_join_out WHERE purchase_ts IS NULL"
            ).collect()
            if nulls:
                break
            _write([(nudge, "2024-01-01 03:00:01", 9, "view", 0.0)])
            nudge += 1
            q.processAllAvailable()
        inner = spark.sql(
            "SELECT user_id FROM outer_join_out WHERE purchase_ts IS NOT NULL"
        ).collect()
    finally:
        q.stop()
    assert 1 in {r["user_id"] for r in nulls}, "unconverted view never emitted"
    assert 2 in {r["user_id"] for r in inner}
    assert 1 not in {r["user_id"] for r in inner}


def test_stream_rate_limit_maxfiles(spark, tmp_path):
    """◇stream-rate: maxFilesPerTrigger paces source ingestion — N input
    files with maxFilesPerTrigger=1 process as N micro-batches (the
    engine-side twin of the connector's requests/min throttle)."""
    src = str(tmp_path / "rated")
    one = spark.createDataFrame([(1, "2024-01-01 00:00:00", 1.0)],
                                "event_id long, ts_s string, value double")
    df = one.select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    for _ in range(3):  # three separate files
        df.write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("rated_out")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) >= 3  # one batch per file, not one big gulp
        assert spark.sql("SELECT count(*) c FROM rated_out").collect()[0]["c"] >= 3
    finally:
        q.stop()


def test_stream_stream_full_outer_join_emits_both_unmatched(spark, tmp_path):
    """FULL OUTER stream-stream join: an orphan purchase (no prior
    view — e.g. direct-link buy) must ALSO emit, with NULL view
    columns, once the watermark passes its match window; unconverted
    views emit as in the left-outer case. Same builder, how switch."""
    import time

    from ocean_data_pipeline_spark.streaming.joins import view_purchase_conversions

    src = str(tmp_path / "funnel_full")
    schema = "event_id long, ts_s string, user_id long, event_type string, value double"

    def _write(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value",
        ).write.mode("append").parquet(src)

    # u1: view, never purchases. u2: converted pair. u3: purchase, no view.
    _write([(1, "2024-01-01 00:05:00", 1, "view", 0.0),
            (2, "2024-01-01 00:10:00", 2, "view", 0.0),
            (3, "2024-01-01 00:30:00", 2, "purchase", 9.5),
            (4, "2024-01-01 00:20:00", 3, "purchase", 4.0)])
    batch_schema = spark.read.parquet(src).schema

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = spark.readStream.schema(batch_schema).parquet(src)
    joined = view_purchase_conversions(*split(stream), how="full_outer")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("full_outer_join_out")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql(
            "SELECT * FROM full_outer_join_out "
            "WHERE purchase_ts IS NULL OR view_ts IS NULL"
        ).collect() == []  # nothing unmatched may leak pre-watermark
        _write([(5, "2024-01-01 03:00:00", 9, "view", 0.0),
                (6, "2024-01-01 03:00:00", 9, "purchase", 1.0)])
        q.processAllAvailable()
        deadline = time.monotonic() + 60
        null_purch, null_view = [], []
        nudge = 7
        while time.monotonic() < deadline:
            null_purch = spark.sql(
                "SELECT user_id FROM full_outer_join_out WHERE purchase_ts IS NULL"
            ).collect()
            null_view = spark.sql(
                "SELECT user_id FROM full_outer_join_out WHERE view_ts IS NULL"
            ).collect()
            if null_purch and null_view:
                break
            _write([(nudge, "2024-01-01 03:00:01", 9, "view", 0.0),
                    (nudge + 1000, "2024-01-01 03:00:01", 9, "purchase", 1.0)])
            nudge += 1
            q.processAllAvailable()
        inner = spark.sql(
            "SELECT user_id FROM full_outer_join_out "
            "WHERE purchase_ts IS NOT NULL AND view_ts IS NOT NULL"
        ).collect()
    finally:
        q.stop()
    assert 1 in {r["user_id"] for r in null_purch}, "unconverted view never emitted"
    assert 3 in {r["user_id"] for r in null_view}, "orphan purchase never emitted"
    assert 2 in {r["user_id"] for r in inner}
