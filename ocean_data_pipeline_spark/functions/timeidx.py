"""Monthly time-axis index conversion (SURVEY.md §2-F
fn-months-between / fn-add-months; reference config.py:115-151).

The reference converts dates to monthly grid indices with explicit
year/month arithmetic — we use the same integer formula (not Spark's
fractional `months_between`) so semantics are exact and identical on
any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.functions.grid import clamp


def date_to_month_index(d: Column, epoch_year: int, n_months: int) -> Column:
    """(year−epoch)*12 + (month−1), clamped to [0, n_months−1].

    Reference config.py:115-135 (clamp to the 72-month window).
    """
    raw = (F.year(d) - F.lit(epoch_year)) * 12 + (F.month(d) - 1)
    return clamp(raw, 0, n_months - 1).cast("int")


def month_index_to_date(idx: Column, epoch_year: int) -> Column:
    """index → first-of-month date (reference config.py:138-151)."""
    return F.add_months(F.to_date(F.lit(f"{epoch_year}-01-01")), idx)
