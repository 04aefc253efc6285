"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query at sf0.001; `queries()` /
`oracle_sql()` expose every implemented operator from SURVEY.md §2 as
(Spark DataFrame fn, DuckDB oracle SQL) pairs, assembled from the
package registry `ocean_data_pipeline_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocean_data_pipeline_spark.queries import load_all
from ocean_data_pipeline_spark.session import tune_for_oracle

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_oracle(spark)
    registry = load_all()
    return registry["monthly_series"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, rq in load_all().items():
        fn = rq.fn

        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            tune_for_oracle(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return {name: rq.oracle for name, rq in load_all().items() if rq.oracle is not None}
