"""Golden-file cleaning parity (SURVEY.md §5): the raw ERDDAP CSV shape
must clean to exactly the reference's cleaned output.

Fixture mirrors the reference artifacts byte-for-byte in shape
(data/sea_surface_sample.csv → data/clean/sea_surface_clean.csv):
header, units row ('UTC,m,degrees_north,degrees_east,degree_C,PSU'),
ISO-8601 UTC times, mixed-case measure names. Edge rows from
FIXTURES.md §A1 are added to pin coerce/dropna semantics.
"""

from __future__ import annotations

import datetime as dt

import pytest

from ocean_data_pipeline_spark.operators.cleaning import (
    clean_raw,
    drop_all_null_measures,
    drop_any_null_measures,
    normalize_column_names,
)

RAW_HEADER = "time,depth,latitude,longitude,Temperature,Salinity"
UNITS_ROW = "UTC,m,degrees_north,degrees_east,degree_C,PSU"
GOLDEN_ROW = "1960-01-16T00:00:00Z,0.0,32.5,-70.0,21.36956,36.396088"


@pytest.fixture()
def raw_csv(tmp_path):
    p = tmp_path / "raw.csv"
    rows = [
        RAW_HEADER,
        UNITS_ROW,
        GOLDEN_ROW,
        # unparseable numerics -> NULL (coerce), kept by dropna-all (one measure present)
        "1960-02-16T00:00:00Z,0.0,32.5,-70.0,not_a_number,35.5",
        # both measures empty -> dropped by dropna-all
        "1960-03-16T00:00:00Z,0.0,32.5,-70.0,,",
        # bad time -> NULL time, measures kept
        "not_a_time,0.0,32.5,-70.0,20.0,36.0",
        # unsorted input (earlier than golden row) -> sort-time must fix
        "1955-01-16T00:00:00Z,0.0,32.5,-70.0,19.5,36.1",
    ]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_clean_matches_reference_golden(spark, raw_csv):
    from ocean_data_pipeline_spark.sources.csv_source import read_clean_csv

    out = read_clean_csv(spark, raw_csv)
    assert [f.name for f in out.schema.fields] == [
        "time", "depth", "latitude", "longitude", "temperature", "salinity",
    ]
    rows = out.collect()
    # dropna-all removed the all-null row; 4 survive
    assert len(rows) == 4
    # sorted by time, NULL time first (Spark default nulls-first)
    times = [r["time"] for r in rows]
    assert times[0] is None
    assert times[1] == dt.datetime(1955, 1, 16)
    # the golden row survives with exact values
    golden = [r for r in rows if r["time"] == dt.datetime(1960, 1, 16)][0]
    assert golden["depth"] == 0.0
    assert golden["latitude"] == 32.5
    assert golden["longitude"] == -70.0
    assert golden["temperature"] == pytest.approx(21.36956)
    assert golden["salinity"] == pytest.approx(36.396088)
    # coerce semantics: 'not_a_number' became NULL, row kept
    feb = [r for r in rows if r["time"] == dt.datetime(1960, 2, 16)][0]
    assert feb["temperature"] is None and feb["salinity"] == 35.5


def test_dropna_any_vs_all(spark, raw_csv):
    from ocean_data_pipeline_spark.sources.csv_source import read_raw_csv
    from ocean_data_pipeline_spark.operators.cleaning import (
        cast_numeric, cast_time, drop_units_row,
    )

    base = cast_numeric(cast_time(drop_units_row(normalize_column_names(read_raw_csv(spark, raw_csv)))))
    assert drop_all_null_measures(base).count() == 4  # drops only the both-null row
    assert drop_any_null_measures(base).count() == 3  # also drops the half-null row


def test_units_row_variants(spark, tmp_path):
    p = tmp_path / "u.csv"
    p.write_text(RAW_HEADER + "\nunits,m,deg,deg,c,psu\n" + GOLDEN_ROW + "\n")
    from ocean_data_pipeline_spark.sources.csv_source import read_clean_csv

    assert read_clean_csv(spark, str(p)).count() == 1


def test_roundtrip_write_read(spark, raw_csv, tmp_path):
    from ocean_data_pipeline_spark.sources.csv_source import (
        read_clean_csv, write_clean_csv,
    )

    out = read_clean_csv(spark, raw_csv).filter("time IS NOT NULL")
    dest = str(tmp_path / "clean_out")
    write_clean_csv(out, dest)
    back = spark.read.option("header", True).csv(dest)
    assert back.count() == out.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in out.schema.fields]
