"""Whole-pipeline streaming == batch equivalence (SURVEY.md §2-H):
the registered stream_file_session_cache query (file stream → session
windows → foreachBatch keep-latest upsert into ResultCache) must leave
the cache in EXACTLY the state the batch engine computes for "each
user's latest session".
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from ocean_data_pipeline_spark.queries.streaming_e2e import _sessions_to_cache_rows
from ocean_data_pipeline_spark.streaming.windows import session_counts
from tests.conftest import SF_SMOKE


def _batch_twin(spark):
    """Latest session per user, computed fully in batch."""
    sessions = session_counts(table(spark, SF_SMOKE, "events"), gap="30 minutes")
    rows = _sessions_to_cache_rows(sessions)
    w = Window.partitionBy("query_hash").orderBy(F.col("fetched_at").desc())
    return (
        rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_hash", "start_date", "end_date", "row_count")
        .orderBy("query_hash")
    )


def test_stream_session_cache_matches_batch(spark):
    fn = load_all()["stream_file_session_cache"].fn
    got = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
    want = [tuple(r) for r in _batch_twin(spark).collect()]
    assert len(got) > 0
    assert got == want


def test_stream_session_cache_is_deterministic_across_runs(spark):
    """Re-running the pipeline (fresh cache + checkpoint per call) over
    the same static input reproduces the identical relation."""
    fn = load_all()["stream_file_session_cache"].fn
    a = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
    assert a == b


def test_stream_dedup_keys_equal_batch_distinct(spark):
    """Streaming dropDuplicates key set == batch DISTINCT (the law the
    DuckDB oracle also pins at sf0.01, here at smoke scale)."""
    fn = load_all()["stream_dedup_keys"].fn
    got = [(r["user_id"], r["event_type"]) for r in fn(spark, SF_SMOKE).collect()]
    want = [
        (r["user_id"], r["event_type"])
        for r in table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_stream_funnel_multibatch_incremental_matches_batch(spark, tmp_path):
    """The funnel state machine must converge to the batch funnel when
    the SAME events arrive split across multiple micro-batches in
    event-time order — the incremental path (state carried between
    batches), not just the single-batch degenerate case."""
    import pandas as pd

    from ocean_data_pipeline_spark.streaming.funnel import funnel_stages

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_type")
        .orderBy("ts")
        .toPandas()
    )
    # write TIMESTAMP(MICROS): pandas' default ns unit would round-trip
    # through the session's nanosAsLong conf as raw longs (TESTDATA.md)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    half = len(ev) // 2
    src = tmp_path / "stream_src"
    src.mkdir()
    # two files; maxFilesPerTrigger=1 => two micro-batches in ts order
    # (file source processes oldest-modified first)
    ev.iloc[:half].to_parquet(src / "part0.parquet", index=False)
    import time as _t

    _t.sleep(1.1)  # distinct mtimes so batch order is deterministic
    ev.iloc[half:].to_parquet(src / "part1.parquet", index=False)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    staged = funnel_stages(stream)
    sink = "stream_funnel_multibatch_test"
    q = (
        staged.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2, "expected at least two micro-batches"
    got = {
        r.user_id: r.stage
        for r in spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("stage").alias("stage"))
        .collect()
    }

    # batch twin over the SAME pandas frame
    pdf = ev
    want = {}
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        tv = tc = tp = None
        for ts, et in zip(g["ts"], g["event_type"]):
            if et == "view" and tv is None:
                tv = ts
            elif et == "click" and tv is not None and tc is None and ts > tv:
                tc = ts
            elif et == "purchase" and tc is not None and tp is None and ts > tc:
                tp = ts
        want[uid] = 3 if tp is not None else 2 if tc is not None else 1 if tv is not None else 0
    assert got == want
