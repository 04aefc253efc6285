"""Gram / covariance accumulation for embedding columns — the scale
path behind `queries/embedding_decomp.py`.

The oracle-friendly pair-explode covariance is O(n * d^2) ROWS through
a shuffle; for 100 TB of vectors (or d in the thousands) that is the
wrong shape. The right shape is the classic partial-sums pattern: each
Arrow batch contributes one d x d Gram partial (numpy X^T X — BLAS,
no per-row Python), partials flow out of mapInPandas as d^2 (i, j,
partial) rows per PARTITION, and one grouped sum reduces them. I/O is
O(n * d) + O(partitions * d^2); the shuffle carries only the tiny
partials.

Reference parity note: the reference has no vector analytics at all —
this operator exists for the beyond-reference embedding surface
(SURVEY.md §2-J), mirroring what MLlib's RowMatrix.computeGramian does
on RDDs, expressed DataFrame-native.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact Gram matrix S_ij = sum_rows x_i * x_j of an array column.

    Returns a DataFrame (i int, j int, sij double) with d^2 rows.
    Values are float64 partial sums per Arrow batch combined by one
    grouped sum — same associativity class as any distributed sum
    (order-dependent only in the last ~1e-15 relative).
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "sij": acc.ravel()}
        )

    parts = df.select(vec_col).mapInPandas(partials, "i int, j int, sij double")
    return parts.groupBy("i", "j").agg(F.sum("sij").alias("sij"))


def covariance_matrix(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Mean-centered covariance C = S/n - m m^T / n^2 from one Gram
    pass plus one per-dimension mean pass (both linear scans)."""
    n = df.count()
    if n == 0:
        spark = df.sparkSession
        return spark.createDataFrame([], "i int, j int, v double")
    s = gram_matrix(df, vec_col)
    m = (
        df.select(F.posexplode(vec_col).alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum(F.col("xi").cast("double")).alias("mi"))
    )
    return (
        s.join(
            m.select(F.col("i").alias("_a"), F.col("mi").alias("mi_a")),
            F.col("i") == F.col("_a"),
        )
        .join(
            m.select(F.col("i").alias("_b"), F.col("mi").alias("mi_b")),
            F.col("j") == F.col("_b"),
        )
        .select(
            "i",
            "j",
            (F.col("sij") / n - F.col("mi_a") * F.col("mi_b") / (n * n)).alias("v"),
        )
    )
