"""Fuzzy / approximate string matching (entity-resolution width).

Two classic record-linkage operators the dedup suite (MinHash LSH,
SimHash, n-gram Jaccard, embedding cosine) doesn't yet cover:

- edit-distance join: Levenshtein ≤ k over BLOCKED candidates —
  typo-class near-duplicates that token-set methods miss entirely
  (token sets of "hot gear"/"hot gears" differ; edit distance is 1).
- sorted-neighborhood method (SNM, Hernández & Stolfo 1995): sort by
  a normalization key, compare only rows within a fixed rank window —
  the O(n·w) blocking strategy when no equality key exists.

Scale posture (both): contract to DISTINCT keys first (the 100 TB
move — the fact table never enters the pair space), generate
candidates from blocks/windows (never all-pairs), run the expensive
distance only on candidates. Levenshtein is JVM-side
(`F.levenshtein`), identical to DuckDB's implementation (probed:
equal on boundary cases including empty strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.text import normalize_text
from ocean_data_pipeline_spark.queries import register

# --- edit-distance join over blocked distinct names -------------------

_EDIT_JOIN_ORACLE = """
WITH names AS (
  SELECT p_name, count(*) AS n_parts
  FROM part GROUP BY p_name
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         a.n_parts AS parts_a, b.n_parts AS parts_b,
         levenshtein(a.p_name, b.p_name) AS edit_dist
  FROM names a
  JOIN names b
    ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
   AND a.p_name < b.p_name
  WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
)
SELECT name_a, name_b, edit_dist, parts_a, parts_b
FROM cand
WHERE edit_dist <= 4
ORDER BY name_a, name_b
"""


@register("edit_distance_name_join", oracle=_EDIT_JOIN_ORACLE)
def edit_distance_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein ≤ 4 self-join over part names: distinct-name
    contraction (64 names carry 2k..2M part rows), equi-join block on
    the noun token, length-band prefilter (|len Δ| ≤ 2 — a free lower
    bound on edit distance), THEN the DP distance on survivors only.
    At 100 TB the contraction is the whole story: the pair space is
    O(distinct²/blocks), independent of fact cardinality."""
    names = (
        table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("noun", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("parts_a"),
        F.col("noun"),
        F.length("p_name").alias("len_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("parts_b"),
        F.col("noun"),
        F.length("p_name").alias("len_b"),
    )
    cand = a.join(b, "noun").where(
        (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= 2)
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= 4)
        .select("name_a", "name_b", "edit_dist", "parts_a", "parts_b")
        .orderBy("name_a", "name_b")
    )


# --- sorted-neighborhood blocking over documents -----------------------

_SNM_WINDOW = 3
_SNM_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(trim(text)),
              '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS norm,
         row_number() OVER (
           ORDER BY substr(trim(regexp_replace(regexp_replace(lower(trim(text)),
                    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), 1, 40),
                    doc_id
         ) AS rn
  FROM documents
  WHERE length(trim(text)) > 0
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.norm AS norm_a, b.norm AS norm_b,
         b.rn - a.rn AS rank_gap
  FROM ranked a
  JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND {_SNM_WINDOW}
),
grams AS (
  SELECT doc_id, unnest(list_distinct(
           regexp_split_to_array(norm, ' '))) AS gram
  FROM (SELECT DISTINCT doc_id, norm FROM ranked) t
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
shared AS (
  SELECT c.id_a, c.id_b, min(c.rank_gap) AS rank_gap, count(*) AS shared
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
  GROUP BY c.id_a, c.id_b
)
SELECT s.id_a, s.id_b, s.rank_gap,
       round(CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.doc_id = s.id_a
JOIN sizes sb ON sb.doc_id = s.id_b
WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.5
ORDER BY id_a, id_b
"""


@register("snm_near_dup_pairs", oracle=_SNM_ORACLE)
def snm_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup detection: normalize → sort by the
    40-char normalized prefix (doc_id tiebreak makes the order total) →
    candidate pairs within a rank window of {_w} → exact unigram
    Jaccard ≥ 0.5 confirm on candidates only. O(n·w) candidates vs
    LSH's banding — the standard alternative when a corpus sorts well
    by its dup key. The rank-window join is rewritten as an EQUI-join
    (the later row carries rn - gap for gap in 1..w), so Spark shuffles
    on the rank key instead of falling into a nested-loop range join —
    the rewrite that keeps SNM O(n·w) on a cluster. spread=True:
    normalization is per-row CPU on degenerate single-row-group scans.
    """
    docs = table(spark, sf_dir, "documents", spread=True).where(
        F.length(F.trim(F.col("text"))) > 0
    )
    normed = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    )
    ranked = normed.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.substring("norm", 1, 40), "doc_id")
        ),
    )
    a = ranked.select(F.col("doc_id").alias("id_a"), F.col("rn").alias("rn_a"))
    # equi-join on the earlier rank: each later row emits w join keys
    b = (
        ranked.select(F.col("doc_id").alias("id_b"), F.col("rn").alias("rn_b"))
        .withColumn(
            "rank_gap",
            F.explode(F.array(*[F.lit(g) for g in range(1, _SNM_WINDOW + 1)])),
        )
        .withColumn("rn_a", F.col("rn_b") - F.col("rank_gap"))
    )
    cand = a.join(b, "rn_a").select("id_a", "id_b", "rank_gap")

    grams = normed.select(
        "doc_id", F.explode(F.array_distinct(F.split("norm", " "))).alias("gram")
    )
    shared = (
        cand.join(grams.select(F.col("doc_id").alias("id_a"), "gram"), "id_a")
        .join(
            grams.select(F.col("doc_id").alias("id_b"), "gram"),
            ["id_b", "gram"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("rank_gap").alias("rank_gap"), F.count(F.lit(1)).alias("shared"))
    )
    sizes = normed.select(
        "doc_id", F.size(F.array_distinct(F.split("norm", " "))).alias("n")
    )
    out = (
        shared.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= 0.5)
    )
    return out.select(
        "id_a", "id_b", "rank_gap", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")
