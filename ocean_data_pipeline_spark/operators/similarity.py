"""Embedding similarity search (SURVEY.md §2-J sim-search).

Baseline: brute-force cosine top-k — probes broadcast against the
corpus, dot products as JVM array expressions (zip_with + left-fold
aggregate; verified bit-identical to DuckDB's list_dot_product), top-k
per probe via window. Linear scan of the corpus per probe batch: the
right baseline at any scale when probe count is small (it's one pass).

Scale path: BucketedRandomProjectionLSH (random-hyperplane buckets) so
candidate sets shrink from |corpus| to bucket occupancy; rows-only
check (bucket boundaries are model-internal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic; portable)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per probe (excluding self-matches).

    Plan: broadcast probes → one corpus scan computes all pair scores →
    rank window partitioned by probe. Output: (probe_id, neighbor_id,
    cosine_sim, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("pv")
    )
    scored = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", cosine(F.col("pv"), F.col("cv")).alias("cosine_sim"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate neighbors via random-projection LSH (MLlib).

    Euclidean-bucketed candidates, exact cosine re-rank on candidates.
    Rows-only correctness (approx recall checked in unit tests).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length,
        numHashTables=num_tables, seed=42,
    )
    model = lsh.fit(c)
    cand = (
        model.approxSimilarityJoin(p, c, float("inf"), distCol="l2")
        .filter(F.col("datasetA.probe_id") != F.col("datasetB.neighbor_id"))
        .select(
            F.col("datasetA.probe_id").alias("probe_id"),
            F.col("datasetB.neighbor_id").alias("neighbor_id"),
            cosine(F.col("datasetA.pv"), F.col("datasetB.cv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )
