"""Deduplication operators (SURVEY.md §2-J dedup-exact / dedup-near).

Exact dedup: content-hash groupBy — one shuffle on a 64-hex key,
keep-lowest-id winner (deterministic).

Near-dup, two tiers:
- Banded MinHash (portable, oracle-checkable): B bands × min-salted-
  SHA256 shingle hash; docs sharing any band bucket are candidates;
  exact n-gram Jaccard confirms. All built-ins — scales as B shuffles
  of (band, doc) pairs, candidate joins only within buckets.
- MLlib MinHashLSH (`approxSimilarityJoin`) as the library path —
  rows-only check (hash seeds are engine-internal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocean_data_pipeline_spark.operators.text import minhash_band, tokens

DEFAULT_BANDS = ("s0", "s1", "s2", "s3")


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """One surviving row per distinct content (lowest id wins)."""
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("content_hash", F.sha2(F.col(content_col), 256))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bands: tuple[str, ...] = DEFAULT_BANDS, k: int = 8
) -> DataFrame:
    """id + one MinHash column per band (single projection, no shuffle)."""
    cols = [F.col(id_col)]
    for b in bands:
        cols.append(minhash_band(F.col(text_col), b, k).alias(f"band_{b}"))
    return df.select(*cols)


def candidate_pairs(
    df: DataFrame, text_col: str, id_col: str, bands: tuple[str, ...] = DEFAULT_BANDS, k: int = 8
) -> DataFrame:
    """LSH banding: pairs (a<b) sharing ≥1 band bucket.

    Per band: shuffle on the band value, self-join inside buckets —
    at scale the bucket sizes (not n²) bound the work. Union + distinct
    merges bands.
    """
    sig = minhash_signatures(df, text_col, id_col, bands, k)
    pairs = None
    for b in bands:
        col = f"band_{b}"
        left = sig.select(F.col(id_col).alias("id_a"), F.col(col).alias("bucket"))
        right = sig.select(F.col(id_col).alias("id_b"), F.col(col).alias("bucket"))
        p = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, pairs: DataFrame, n: int = 3
) -> DataFrame:
    """Exact word n-gram Jaccard for given candidate pairs.

    Shingle sets are computed once per doc (explode + distinct), then
    the pair join counts shared shingles — set sizes via a broadcast-
    able per-doc count. Returns (id_a, id_b, jaccard).
    """
    tok = df.select(F.col(id_col).alias("doc"), tokens(F.lower(F.col(text_col))).alias("toks"))
    grams = (
        tok.select(
            "doc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                    lambda i: F.array_join(F.slice(F.col("toks"), i + 1, n), " "),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        pairs.join(grams.select(F.col("doc").alias("id_a"), "gram"), "id_a")
        .join(grams.select(F.col("doc").alias("id_b"), F.col("gram").alias("gram_b")), "id_b")
        .filter(F.col("gram") == F.col("gram_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.select(F.col("doc").alias("id_a"), F.col("n_grams").alias("na")), "id_a")
        .join(sizes.select(F.col("doc").alias("id_b"), F.col("n_grams").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
    )


def mllib_minhash_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.6, num_tables: int = 8
):
    """Library path: MLlib MinHashLSH over hashed shingle features.
    Rows-only (seeded internals); import-gated so environments without
    MLlib native deps degrade cleanly."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    tok = df.select(
        F.col(id_col).alias("doc"), tokens(F.lower(F.col(text_col))).alias("toks")
    ).filter(F.size("toks") > 0)
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(tok)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="dist")
    return (
        joined.filter(F.col("datasetA.doc") < F.col("datasetB.doc"))
        .select(
            F.col("datasetA.doc").alias("id_a"),
            F.col("datasetB.doc").alias("id_b"),
            (1 - F.col("dist")).alias("est_jaccard"),
        )
    )
