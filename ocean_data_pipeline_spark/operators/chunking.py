"""Document chunking for training-data pipelines: split each document
into fixed-size overlapping token windows (the context-window prep
step before tokenization/packing). Pure built-in expressions — split,
sequence, explode, slice — so the whole operator stays in whole-stage
codegen; no Python touches the tokens.

Scale posture: explode multiplies rows by ~n_tokens/stride, which is
bounded and uniform per doc — no skew, no shuffle (chunking is a
map-side operation; the downstream writer decides partitioning).

Reference parity: capability-class extension (SURVEY.md §2-J
text-analysis); the reference has no text pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_by_tokens(
    docs: DataFrame,
    window: int = 30,
    stride: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, chunk): chunk k covers whitespace-tokens
    [k*stride, k*stride + window). Chunk starts run 0, stride, 2·stride
    … while start < n_tokens, so the tail is always covered (the last
    chunk may be short and overlap-redundant — the standard
    sliding-window contract). Output: (id, chunk_id, n_tokens,
    chunk_text).
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    ).withColumn("n", F.size("toks"))
    starts = F.sequence(
        F.lit(0), F.col("n") - 1, F.lit(stride)
    )  # 0, stride, ... < n  (sequence stop is inclusive)
    return (
        toks.select(
            id_col, "toks", "n", F.explode(starts).alias("start")
        )
        .select(
            F.col(id_col),
            (F.col("start") / stride).cast("int").alias("chunk_id"),
            F.least(F.lit(window), F.col("n") - F.col("start")).alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, window), " "
            ).alias("chunk_text"),
        )
    )
