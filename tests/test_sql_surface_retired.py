"""Coverage for queries retired from the driver registry (VERDICT r08
item 7 holds net registry growth while the rotation backlog drains).
Retired queries keep full oracle-parity + plan tests here so the
capability never regresses even though the driver no longer checks it.
"""

from __future__ import annotations

import pandas as pd

from ocean_data_pipeline_spark.queries.sql_surface import (
    _SQL_SERIES,
    sql_series_ordered,
)

from .conftest import SF_ORACLE


def test_sql_series_ordered_oracle_parity(spark, duck):
    got = sql_series_ordered(spark, SF_ORACLE).toPandas()
    want = duck.execute(_SQL_SERIES).fetchdf()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 500
    # catalog.table lands ts at microsecond precision (timestamp_micros
    # of the nanos long); floor the DuckDB TIMESTAMP_NS side to match.
    got["ts"] = pd.to_datetime(got["ts"]).dt.floor("us")
    want["ts"] = pd.to_datetime(want["ts"]).dt.floor("us")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


def test_sql_series_ordered_plan(spark):
    df = sql_series_ordered(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sql_series_ordered_not_registered():
    from ocean_data_pipeline_spark.queries import load_all

    assert "sql_series_ordered" not in load_all()
