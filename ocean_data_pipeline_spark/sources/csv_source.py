"""ERDDAP-shaped CSV source (SURVEY.md §2-A scan-csv + §2-B cleaning).

Reads the reference's raw CSV shape — header row, a units row
(`UTC,m,degrees_north,...`), then data rows (reference
data/sea_surface_sample.csv; parse at pipeline/extract.py:160-162) —
into the canonical cleaned sea_surface schema. The units row is
dropped by VALUE (first column ∈ {'UTC','units'}), not by position:
row positions don't exist in a distributed scan, so this is the
100 TB-safe formulation of the reference's `iloc[0]` check
(pipeline/extract.py:199-201).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocean_data_pipeline_spark.operators.cleaning import clean_raw


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw scan: header + whitespace-skip, everything as string
    (typing happens in the cleaning pass — coerce semantics)."""
    return (
        spark.read.option("header", True)
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(path)
    )


def read_clean_csv(spark: SparkSession, path: str) -> DataFrame:
    """Full ingestion: scan → units-row drop → normalize → cast →
    dropna → time-sorted canonical frame (reference TRANSFORM stage,
    pipeline/transform.py:30-41)."""
    return clean_raw(read_raw_csv(spark, path))


def write_clean_csv(df: DataFrame, path: str) -> None:
    """sink-csv: header, no index column (reference
    pipeline/transform.py:36-38). Single-file output is a driver-side
    convenience only; at scale leave partitioned."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
