"""Embedding decomposition (SURVEY.md §2-J width, the analysis side of
the ANN/near-dup stack): exact covariance of the embedding cloud and
its dominant principal component by fixed-count power iteration — the
"what direction dominates this vector corpus" diagnostic behind
whitening, drift detection, and anisotropy checks on embedding spaces.

Scale design: the covariance build shown here is the oracle-friendly
O(n*d^2) pair-explode formulation; at 100 TB (or d in the thousands)
the engine-side cutover is per-partition Gram accumulation in
mapInPandas (numpy X^T X per Arrow batch -> d^2-cell partials summed
by ONE reduce), which produces the identical matrix with O(n*d) I/O —
IMPLEMENTED in operators/gram.py (covariance_matrix) and pinned equal
to this formulation in tests/test_round5_ops.py.
Everything after the covariance is O(d^2) per iteration — scale-
invariant driver-side-sized work kept distributed here only so the
oracle can replay it.

Determinism: both engines run the SAME 6 power iterations from the
same deterministic start vector (all-ones normalized), so the result
is the same mathematical vector regardless of convergence; power
iteration contracts fp perturbations, leaving ~1e-13 cross-engine
noise against round(6) outputs. Sign is fixed by forcing component 0
non-negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

_ITERS = 6

_PCA_ORACLE = f"""
WITH x AS (
  SELECT vec_id, i - 1 AS i, CAST(xi AS DOUBLE) AS xi FROM (
    SELECT vec_id, unnest(embedding) AS xi,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  )
),
nn AS (SELECT count(*) AS n FROM embeddings),
s AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS sij
  FROM x a JOIN x b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
),
m AS MATERIALIZED (SELECT i, sum(xi) AS mi FROM x GROUP BY i),
c AS MATERIALIZED (
  SELECT s.i, s.j,
         s.sij / (SELECT n FROM nn)
           - ma.mi * mb.mi / ((SELECT n FROM nn) * (SELECT n FROM nn)) AS v
  FROM s JOIN m ma ON ma.i = s.i JOIN m mb ON mb.i = s.j
),
dims AS (SELECT DISTINCT i FROM c),
v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt((SELECT count(*) FROM dims)) AS v FROM dims),
w1 AS MATERIALIZED (SELECT c.i, sum(c.v * v0.v) AS w FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
v1 AS MATERIALIZED (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w1) AS v FROM w1),
w2 AS MATERIALIZED (SELECT c.i, sum(c.v * v1.v) AS w FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
v2 AS MATERIALIZED (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w2) AS v FROM w2),
w3 AS MATERIALIZED (SELECT c.i, sum(c.v * v2.v) AS w FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i),
v3 AS MATERIALIZED (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w3) AS v FROM w3),
w4 AS MATERIALIZED (SELECT c.i, sum(c.v * v3.v) AS w FROM c JOIN v3 ON v3.i = c.j GROUP BY c.i),
v4 AS MATERIALIZED (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w4) AS v FROM w4),
w5 AS MATERIALIZED (SELECT c.i, sum(c.v * v4.v) AS w FROM c JOIN v4 ON v4.i = c.j GROUP BY c.i),
v5 AS MATERIALIZED (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w5) AS v FROM w5),
w6 AS MATERIALIZED (SELECT c.i, sum(c.v * v5.v) AS w FROM c JOIN v5 ON v5.i = c.j GROUP BY c.i),
lam AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS l FROM w6),
v6 AS MATERIALIZED (SELECT i, w / (SELECT l FROM lam) AS v FROM w6),
sgn AS (
  SELECT CASE WHEN (SELECT v FROM v6 WHERE i = 0) < 0 THEN -1.0 ELSE 1.0 END AS s
),
tr AS (SELECT sum(v) AS t FROM c WHERE i = j)
SELECT v6.i AS dim_idx,
       round((SELECT s FROM sgn) * v6.v, 6) AS loading,
       round((SELECT l FROM lam), 6) AS eigenvalue,
       round((SELECT l FROM lam) / (SELECT t FROM tr), 6) AS var_explained
FROM v6 ORDER BY dim_idx
"""


@register("embedding_top_component", oracle=_PCA_ORACLE)
def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding cloud: exact
    mean-centered covariance (pair-explode sums, C = S/n - m m^T/n^2),
    then 6 power iterations from the normalized all-ones vector;
    output is one row per dimension with the sign-fixed loading, the
    top eigenvalue (norm of the last un-normalized iterate), and the
    explained-variance ratio against trace(C).

    Plan shape: ONE n*d explode + self equi-join on vec_id builds the
    d^2 covariance (checkpointed — six iterations reuse it without
    re-deriving the 2M-row pair aggregation); each iteration is an
    equi-join + 64-key partial agg + a 1-row norm broadcast. See the
    module docstring for the mapInPandas Gram cutover that replaces
    the pair explode at scale."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xi")
    ).select("vec_id", "i", F.col("xi").cast("double").alias("xi"))
    n = emb.count()
    if n == 0:
        return spark.createDataFrame(
            [],
            "dim_idx bigint, loading double, eigenvalue double, var_explained double",
        )
    a = x.select("vec_id", F.col("i").alias("ai"), F.col("xi").alias("ax"))
    b = x.select("vec_id", F.col("i").alias("bi"), F.col("xi").alias("bx"))
    s = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bi").alias("j"))
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("sij"))
    )
    m = x.groupBy("i").agg(F.sum("xi").alias("mi"))
    c = (
        s.join(m.select(F.col("i").alias("_mi_i"), F.col("mi").alias("mi_a")),
               F.col("i") == F.col("_mi_i"))
        .join(m.select(F.col("i").alias("_mj_i"), F.col("mi").alias("mi_b")),
              F.col("j") == F.col("_mj_i"))
        .select(
            "i",
            "j",
            (
                F.col("sij") / n - F.col("mi_a") * F.col("mi_b") / (n * n)
            ).alias("v"),
        )
    ).localCheckpoint()
    d = c.select("i").distinct().count()
    v = c.select("i").distinct().select(
        "i", F.lit(1.0 / d**0.5).alias("v")
    )
    lam = None
    for k in range(_ITERS):
        # Checkpoint each 64-row iterate: v feeds the next matvec
        # TWICE (numerator and norm) — left lazy, the plan doubles per
        # iteration and Catalyst optimization time grows 2^iters.
        w = (
            c.join(v.select(F.col("i").alias("j"), F.col("v").alias("vj")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("v") * F.col("vj")).alias("w"))
        ).localCheckpoint()
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        # zero-variance corpus (constant vectors) => C = 0 => w = 0:
        # keep a zero iterate instead of dividing by a zero norm (ANSI)
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i",
            F.when(F.col("nrm") != 0, F.col("w") / F.col("nrm"))
            .otherwise(0.0)
            .alias("v"),
        )
        if k == _ITERS - 1:
            lam = nrm
    sgn = v.filter(F.col("i") == 0).select(
        F.when(F.col("v") < 0, -1.0).otherwise(1.0).alias("s")
    )
    tr = c.filter(F.col("i") == F.col("j")).agg(F.sum("v").alias("t"))
    return (
        v.crossJoin(F.broadcast(sgn))
        .crossJoin(F.broadcast(lam.select(F.col("nrm").alias("l"))))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("i").cast("bigint").alias("dim_idx"),
            F.round(F.col("s") * F.col("v"), 6).alias("loading"),
            F.round(F.col("l"), 6).alias("eigenvalue"),
            F.when(F.col("t") != 0, F.round(F.col("l") / F.col("t"), 6)).alias(
                "var_explained"
            ),
        )
        .orderBy("dim_idx")
    )
