"""End-to-end ETL orchestrator tests (SURVEY.md §3.1): CSV fixture →
clean parquet checkpoints → saved table, with each stage validator's
report checked, plus short-circuit behavior on bad input.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.plans.pipeline import run_pipeline

RAW = """time,depth,latitude,longitude,Temperature,Salinity
UTC,m,degrees_north,degrees_east,degree_C,PSU
1960-01-16T00:00:00Z,0.0,32.5,-70.0,21.36956,36.396088
1955-01-16T00:00:00Z,0.0,32.5,-70.0,19.5,36.1
1960-03-16T00:00:00Z,0.0,32.5,-70.0,,
"""


@pytest.fixture()
def raw_csv(tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text(RAW)
    return str(p)


def test_full_pipeline(spark, raw_csv, tmp_path):
    res = run_pipeline(spark, raw_csv, str(tmp_path / "work"), table_name="sea_surface_t1")
    try:
        rep = res.report()
        assert res.ok, rep
        assert [s.stage for s in res.stages] == ["extract", "transform", "load"]
        assert rep["stages"]["extract"]["rows"] == 4  # units row still present in raw
        assert rep["stages"]["transform"]["rows"] == 2  # units + all-null dropped
        assert rep["stages"]["transform"]["in_range"] is True
        # terminal table is queryable with real timestamps (not VARCHAR —
        # the deliberate deviation from the reference's DuckDB table)
        t = spark.table("sea_surface_t1")
        assert t.schema["time"].dataType.typeName() == "timestamp"
        assert t.count() == 2
        # idempotent load: mode=ignore ≙ CREATE TABLE IF NOT EXISTS
        res2 = run_pipeline(spark, raw_csv, str(tmp_path / "work2"), table_name="sea_surface_t1")
        assert res2.ok and spark.table("sea_surface_t1").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS sea_surface_t1")


def test_pipeline_short_circuits_on_empty(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("time,Temperature,Salinity\n")
    res = run_pipeline(spark, str(p), str(tmp_path / "work"), table_name="should_not_exist_t")
    assert not res.ok
    assert [s.stage for s in res.stages] == ["extract"]  # stopped at first gate
    assert not spark.catalog.tableExists("should_not_exist_t")


def test_pipeline_flags_out_of_range(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "time,Temperature,Salinity\n"
        "1960-01-16T00:00:00Z,99.0,36.0\n"  # temp out of physical bounds
    )
    res = run_pipeline(spark, str(p), str(tmp_path / "work"), table_name="should_not_exist_t2")
    assert not res.ok
    assert res.stages[-1].stage == "transform"
    assert res.stages[-1].checks["in_range"] is False
    assert not spark.catalog.tableExists("should_not_exist_t2")
