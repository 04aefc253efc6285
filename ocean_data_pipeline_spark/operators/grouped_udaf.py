"""Grouped-map Pandas UDAF surface (SURVEY.md §2-I): applyInPandas
returning one row per group — the engine's escape hatch for per-group
logic that built-ins can't express (here: median absolute deviation,
a nested-median statistic with no single-pass SQL aggregate).

Scale contract: one group must fit in one worker's memory (Arrow batch
per group). Right for dimensional groupings (nations, segments); for
high-cardinality keys use built-in aggs or two-stage approx sketches
instead — this is the documented boundary of the grouped-map path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

MAD_SCHEMA = "group_key int, med double, mad double, n long"


def _mad_fn(value_col: str):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        med = v.median()
        return pd.DataFrame(
            {
                "group_key": [int(pdf["__key"].iloc[0])],
                "med": [round(float(med), 6)],
                "mad": [round(float((v - med).abs().median()), 6)],
                "n": [len(v)],
            }
        )

    return fn


def grouped_mad(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-group median + median-absolute-deviation via applyInPandas."""
    from pyspark.sql import functions as F

    return (
        df.select(F.col(key_col).cast("int").alias("__key"), value_col)
        .groupBy("__key")
        .applyInPandas(_mad_fn(value_col), schema=MAD_SCHEMA)
    )
