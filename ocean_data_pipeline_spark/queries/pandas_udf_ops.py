"""pandas_udf eval classes (SCALAR and GROUPED_AGG) — the two Arrow
UDF forms the engine didn't yet exercise (mapInPandas, applyInPandas,
applyInPandasWithState and Python UDTF are covered elsewhere; this
completes the Python-execution matrix).

Both UDFs are chosen so their results are EXACT across engines:

- scalar `digit_sum` is integer arithmetic (vectorized pandas ops on
  int64 — no floats at all);
- grouped-agg `np.median` on doubles is order-insensitive (sort +
  midpoint; the even-count interpolation (a+b)/2 is one IEEE add and
  one halving, bit-identical to DuckDB's quantile_cont(0.5)).

Scale posture: GROUPED_AGG ships each group's column to one task as an
Arrow batch — right for many modest groups (5 segments × ~thousands of
rows here; document-sized groups at 100 TB), wrong for one giant group
(that's what the sort-based exact quantiles query covers). The scalar
UDF is embarrassingly parallel Arrow batches.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# infers eval type from REAL annotation objects; stringified hints
# raise UNSUPPORTED_SIGNATURE.
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

_PUDF_ORACLE = """
WITH digits AS (
  SELECT c_mktsegment, c_acctbal,
         CAST((c_custkey % 10)
            + (c_custkey // 10) % 10
            + (c_custkey // 100) % 10
            + (c_custkey // 1000) % 10
            + (c_custkey // 10000) % 10
            + (c_custkey // 100000) % 10
            + (c_custkey // 1000000) % 10
            + (c_custkey // 10000000) % 10
            + (c_custkey // 100000000) % 10 AS BIGINT) AS dsum
  FROM customer
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(dsum) AS BIGINT) AS digit_sum_total,
       median(c_acctbal) AS median_acctbal
FROM digits
GROUP BY c_mktsegment
ORDER BY segment
"""


@register("pandas_udf_segment_stats", oracle=_PUDF_ORACLE)
def pandas_udf_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment stats through BOTH pandas_udf eval classes: a
    vectorized SCALAR udf (digit sum of the customer key — pure int64
    pandas arithmetic) and a GROUPED_AGG udf (np.median of acctbal),
    aggregated in one groupBy. The oracle recomputes the digit sum
    with div/mod arithmetic and the median with quantile semantics."""
    import pandas as pd

    @F.pandas_udf("long")
    def digit_sum(k: pd.Series) -> pd.Series:
        total = k * 0
        cur = k
        for _ in range(9):
            total = total + cur % 10
            cur = cur // 10
        return total

    @F.pandas_udf("double")
    def median_agg(v: pd.Series) -> float:
        import numpy as np

        return float(np.median(v.to_numpy()))

    cust = table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        digit_sum(F.col("c_custkey")).alias("dsum"),
        "c_acctbal",
    )
    # GROUPED_AGG pandas UDFs can't share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — split and rejoin on the 5-row
    # segment key (broadcast).
    jvm_side = cust.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dsum").cast("bigint").alias("digit_sum_total"),
    )
    udaf_side = cust.groupBy("segment").agg(
        median_agg(F.col("c_acctbal")).alias("median_acctbal")
    )
    return jvm_side.join(F.broadcast(udaf_side), "segment").orderBy("segment")
