"""End-to-end corpus dedup pipeline (SURVEY.md §2-J dedup-near,
composed): the full chain a training-data pipeline actually runs,
as ONE registered query instead of piecewise stages —

    banded-MinHash candidates  →  exact n-gram-Jaccard confirm
      →  connected components  →  keep-smallest-id representative
      →  per-document dedup census.

Reference parity: capability-class extension of the reference's
exact-key dedup (cache_manager.py:153-157) to content near-dedup;
the orchestration shape mirrors run_pipeline.py:271-305 (staged
extract→confirm→commit) re-expressed as a single lazy DataFrame plan
plus the iterative component loop.

Scale posture, stage by stage (the 100 TB story):
- Candidates come from an EQUI-JOIN on (band_idx, band_value) buckets
  — never an all-pairs comparison. Bucket sizes bound the pair
  blowup; at scale you add bands/rows-per-band to tune recall, and
  hot buckets are capped (cf. winnowing's stop-hash cap).
- The exact-Jaccard confirm runs ONLY on candidate pairs (a join
  against the shingle table), so its cost is O(candidates), not
  O(n²).
- Components use operators.components.connected_components —
  iterative min-label propagation, one narrow shuffle per round,
  O(log diameter) rounds with pointer jumping, nothing collected to
  the driver but a convergence scalar.
- The census is a window count over the component label — one
  shuffle on a key whose cardinality is the number of clusters.

The DuckDB oracle replays the identical pipeline with a recursive CTE
for the closure — feasible at the sf0.01 bound (150 docs), and
exactly the construct that does NOT scale, which is why the engine
side iterates instead of recursing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.components import connected_components
from ocean_data_pipeline_spark.operators.dedup import jaccard_pairs
from ocean_data_pipeline_spark.operators.text import minhash_band
from ocean_data_pipeline_spark.queries import register

#: Bound for the oracle-checked demonstration (recursive-CTE closure
#: in DuckDB is exponential-ish in cluster size; 150 docs closes in
#: ~2 s). The engine side has no such bound at scale.
DOC_BOUND = 150
JACCARD_CONFIRM = 0.8

_E2E_ORACLE = """
WITH RECURSIVE
docs AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id < 150 AND length(trim(text)) > 0
),
shingled AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(1, length(text) - 7)),
                               i -> substr(text, i, 8))) AS shingle
  FROM docs
),
sig AS (
  SELECT doc_id,
         min(sha256('s0_' || shingle)) AS band_s0,
         min(sha256('s1_' || shingle)) AS band_s1
  FROM shingled GROUP BY doc_id
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND (a.band_s0 = b.band_s0 OR a.band_s1 = b.band_s1)
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS gram
  FROM docs
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
shared AS (
  SELECT c.id_a, c.id_b, count(*) AS shared
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
  GROUP BY 1, 2
),
confirmed AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON sa.doc_id = s.id_a
  JOIN sizes sb ON sb.doc_id = s.id_b
  WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM confirmed
  UNION ALL
  SELECT id_b, id_a FROM confirmed
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
),
labels AS (SELECT u, min(r) AS component FROM reach GROUP BY u)
SELECT d.doc_id,
       coalesce(l.component, d.doc_id)                                AS rep_id,
       count(*) OVER (PARTITION BY coalesce(l.component, d.doc_id))   AS n_members,
       (d.doc_id = coalesce(l.component, d.doc_id))                   AS kept
FROM docs d LEFT JOIN labels l ON l.u = d.doc_id
ORDER BY doc_id
"""


@register("dedup_pipeline_end2end", oracle=_E2E_ORACLE)
def dedup_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates → confirm → components → keep-one census, end to end.

    Output: one row per document — (doc_id, rep_id, n_members, kept).
    `kept` marks the smallest-id representative of each duplicate
    cluster; a downstream pipeline keeps exactly the kept=true rows.
    """
    docs = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < DOC_BOUND) & (F.length(F.trim(F.col("text"))) > 0)
    )

    # Stage 1 — banded-MinHash signatures → bucket equi-join. Each doc
    # lands in one bucket per band; docs sharing ANY bucket become a
    # candidate pair. distinct() collapses pairs caught by both bands.
    sig = docs.select(
        "doc_id",
        minhash_band(F.col("text"), "s0").alias("band_s0"),
        minhash_band(F.col("text"), "s1").alias("band_s1"),
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_idx"), F.col("band_s0").alias("band_val")),
                F.struct(F.lit(1).alias("band_idx"), F.col("band_s1").alias("band_val")),
            )
        ).alias("band"),
    ).select("doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_val").alias("band_val"))
    left = bands.select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_val"
    )
    right = bands.select(
        F.col("doc_id").alias("id_b"), "band_idx", "band_val"
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Stage 2 — exact unigram-Jaccard confirm, candidates only.
    confirmed = (
        jaccard_pairs(docs, "text", "doc_id", cand, n=1)
        .filter(F.col("jaccard") >= JACCARD_CONFIRM)
        .select("id_a", "id_b")
    )

    # Stage 3 — transitive closure: cluster label = smallest member id.
    labels = connected_components(confirmed, src="id_a", dst="id_b")

    # Stage 4 — census + keep-one-representative flag.
    out = (
        docs.select("doc_id")
        .join(labels, docs.doc_id == labels.id, "left")
        .select("doc_id", F.coalesce("component", F.col("doc_id")).alias("rep_id"))
    )
    w = Window.partitionBy("rep_id")
    return (
        out.withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn("kept", F.col("doc_id") == F.col("rep_id"))
        .orderBy("doc_id")
    )
