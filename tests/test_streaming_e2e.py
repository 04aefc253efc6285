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
