"""Record-linkage / entity-resolution operators: blocked fuzzy string
matching (Jaro–Winkler), phonetic-key blocking, and SimHash
hamming-band candidate joins (reference parity: the reference cleans
and joins station/series identifiers — pipeline/transform.py — but has
no fuzzy layer; this family is the entity-resolution toolkit a
100 TB corpus needs on top of `fuzzy_ops`' edit-distance /
sorted-neighborhood passes).

Scale posture shared by all three: NEVER score all pairs. Pairs are
generated inside blocks (equal first character, phonetic key, or an
equal 4-bit SimHash band — pigeonhole-complete for hamming ≤ 3), and
every block key is produced by one shuffle over the DISTINCT value
relation, which is vocabulary-bounded and orders of magnitude smaller
than the fact table. The expensive comparator runs on candidates only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

# --- Jaro–Winkler blocked pair scoring --------------------------------

_JW_THRESHOLD = 0.5

_JW_ORACLE = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name FROM part
),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b,
         jaro_winkler_similarity(a.name, b.name) AS jw
  FROM names a JOIN names b
    ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
   AND a.name < b.name
)
SELECT name_a, name_b, jw
FROM pairs
WHERE jw >= {_JW_THRESHOLD}
ORDER BY jw DESC, name_a, name_b
"""


def _jaro(s1: str, s2: str) -> float:
    """Reference Jaro similarity (Jaro, JASA'89) — exact IEEE-double
    twin of DuckDB's jaro_similarity (bit-equal on the full p_name
    vocabulary, verified pairwise)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    md = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(len2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3


def _jaro_winkler(s1: str, s2: str) -> float:
    """Winkler's prefix-boosted variant (Winkler, ASA'90): p=0.1,
    boost threshold 0.7, prefix capped at 4 — DuckDB's definition."""
    j = _jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j = j + prefix * 0.1 * (1.0 - j)
    return j


@F.pandas_udf(T.DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_jaro_winkler(x, y) for x, y in zip(a, b)])


@register("jaro_winkler_toppairs", oracle=_JW_ORACLE)
def jaro_winkler_toppairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match of the part-name vocabulary: distinct
    names, candidate pairs only within a first-character block (the
    prefix Winkler's boost rewards anyway), scored by an Arrow-batched
    Jaro–Winkler pandas UDF, kept at jw >= 0.5.

    Determinism: the Python comparator is bit-equal to DuckDB's
    jaro_winkler_similarity on this vocabulary (same IEEE expression
    tree: (m/l1 + m/l2 + (m-t)/m)/3, then jw = j + l*0.1*(1-j) when
    j > 0.7) — the oracle checks raw doubles, no rounding.

    Plan shape: DISTINCT over a single projected column (one shuffle,
    vocabulary-sized output), a self-join keyed on the block character
    (broadcast — the name relation is tiny), and the pandas UDF runs
    on candidate pairs only. At 100 TB the name relation stays
    vocabulary-bounded, so the pair stage is scale-invariant; only the
    DISTINCT scales with the fact table."""
    names = table(spark, sf_dir, "part").select(F.col("p_name").alias("name")).distinct()
    a = names.select(
        F.col("name").alias("name_a"), F.substring("name", 1, 1).alias("blk_a")
    )
    b = names.select(
        F.col("name").alias("name_b"), F.substring("name", 1, 1).alias("blk_b")
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")),
    )
    return (
        pairs.select(
            "name_a", "name_b", _jw_udf(F.col("name_a"), F.col("name_b")).alias("jw")
        )
        .filter(F.col("jw") >= _JW_THRESHOLD)
        .orderBy(F.desc("jw"), "name_a", "name_b")
    )


# --- Phonetic-skeleton blocking census --------------------------------

# Blocking key: first letter + devoweled remainder of the lowercased
# alpha-only name, truncated to 4 chars. Soundex-ish but backreference-
# free, so the SAME regex runs on Java regex (Spark) and RE2 (DuckDB).
# The only dialect split is replace-all: Spark's regexp_replace is
# global by default; DuckDB needs the 'g' flag argument.
_SKEL_TMPL = """substr(
  substr(regexp_replace(lower({col}), '[^a-z]', ''{flags}), 1, 1) ||
  regexp_replace(substr(regexp_replace(lower({col}), '[^a-z]', ''{flags}), 2),
                 '[aeiouy]', ''{flags}),
  1, 4)"""
_SKEL_SQL = _SKEL_TMPL.replace("{flags}", ", 'g'")       # DuckDB oracle
_SKEL_SPARK = _SKEL_TMPL.replace("{flags}", "")          # Spark SQL expr

_PHONETIC_ORACLE = f"""
WITH keys AS (
  SELECT p_name, {_SKEL_SQL.format(col="p_name")} AS blk FROM part
),
per_name AS (
  SELECT blk, p_name, count(*) AS n_rows FROM keys GROUP BY blk, p_name
)
SELECT blk,
       count(*) AS n_names,
       CAST(sum(n_rows) AS BIGINT) AS n_parts,
       CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS candidate_pairs,
       min(p_name) AS example_name
FROM per_name
GROUP BY blk
ORDER BY blk
"""


@register("phonetic_block_census", oracle=_PHONETIC_ORACLE)
def phonetic_block_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking census: consonant-skeleton key (first letter +
    devoweled tail, 4 chars — the backreference-free cousin of Soundex,
    identical under Java regex and RE2) over part names; per block the
    distinct-name count, row count, and the candidate-pair budget
    n·(n−1)/2 a pairwise matcher would score inside the block — the
    blocking-quality readout (Σ pairs ≪ N²/2) that decides whether a
    linkage pass is runnable at 100 TB.

    Plan shape: one shuffle on (blk, name) for the per-name partial,
    one tiny agg on blk; integer/string output only."""
    skel = F.expr(_SKEL_SPARK.format(col="p_name"))
    per_name = (
        table(spark, sf_dir, "part")
        .select(F.col("p_name"), skel.alias("blk"))
        .groupBy("blk", "p_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    n = F.count(F.lit(1))
    return (
        per_name.groupBy("blk")
        .agg(
            n.alias("n_names"),
            F.sum("n_rows").cast("bigint").alias("n_parts"),
            (n * (n - F.lit(1)) / F.lit(2)).cast("bigint").alias("candidate_pairs"),
            F.min("p_name").alias("example_name"),
        )
        .orderBy("blk")
    )


# --- SimHash hamming-band pair join -----------------------------------

_HAMMING_MAX = 3  # 4 bands x 4 bits: pigeonhole-complete for <= 3 flips


def _simhash_sigs_sql() -> str:
    from ocean_data_pipeline_spark.queries.llm_ops import _oracle_simhash

    return f"""
tokenized AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        t -> CAST(('0x' || substr(sha256(t), 1, 4)) AS INT)) AS hs
  FROM documents WHERE length(trim(text)) > 0
),
sigs AS (
  SELECT {_oracle_simhash()} AS sig, count(*) AS cnt
  FROM tokenized GROUP BY 1
)"""


_SIMHASH_PAIRS_ORACLE = f"""
WITH {_simhash_sigs_sql()},
cross_pairs AS (  -- naive all-pairs: the zero-false-negative proof
  SELECT bit_count(xor(CAST(a.sig AS BIGINT), CAST(b.sig AS BIGINT))) AS dist,
         a.cnt * b.cnt AS doc_pairs
  FROM sigs a JOIN sigs b ON a.sig < b.sig
  WHERE bit_count(xor(CAST(a.sig AS BIGINT), CAST(b.sig AS BIGINT))) <= {_HAMMING_MAX}
),
within AS (
  SELECT 0 AS dist,
         CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_sig_pairs,
         CAST(coalesce(sum(cnt * (cnt - 1) / 2), 0) AS BIGINT) AS n_doc_pairs
  FROM sigs
),
between_sigs AS (
  SELECT dist,
         CAST(count(*) AS BIGINT) AS n_sig_pairs,
         CAST(sum(doc_pairs) AS BIGINT) AS n_doc_pairs
  FROM cross_pairs GROUP BY dist
)
SELECT CAST(dist AS INT) AS dist, n_sig_pairs, n_doc_pairs FROM within
UNION ALL
SELECT CAST(dist AS INT) AS dist, n_sig_pairs, n_doc_pairs FROM between_sigs
ORDER BY dist
"""


@register("simhash_hamming_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate census by SimHash hamming distance: 16-bit
    signatures (operators.text.simhash16), pairs at distance <= 3 found
    by the banding pigeonhole — split the signature into 4 disjoint
    4-bit bands; <= 3 bit flips leave at least one band intact, so an
    equi-join per band finds EVERY such pair (Manku et al., WWW'07
    layout). dist=0 reports identical-signature groups (n_sig_pairs =
    signatures shared by >1 doc; n_doc_pairs = Σ C(cnt,2)); dist 1..3
    report cross-signature pairs weighted by doc multiplicity. The
    oracle recomputes via the NAIVE all-pairs join over distinct
    signatures — parity is the machine-checked proof the banding has
    zero false negatives.

    Plan shape: one shuffle groups docs into distinct signatures
    (signature-space-bounded, <= 65536 rows here); bands explode x4 on
    that small relation; the band equi-join shuffles signature rows,
    never doc rows; popcount confirm and the doc-pair weighting are
    per-candidate expressions. At 100 TB with 64-bit signatures the
    same plan holds: the join stays on the distinct-signature relation
    and banding bounds the candidate set."""
    from ocean_data_pipeline_spark.operators.text import simhash16

    docs = table(spark, sf_dir, "documents", spread=True).filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    sigs = (
        docs.select(simhash16(F.col("text")).alias("sig"))
        .groupBy("sig")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()  # consumed by 3 subtrees (2 band sides + within)
    )
    bands = sigs.select(
        "sig",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_i"),
                        F.shiftright("sig", 4 * i).bitwiseAND(F.lit(15)).alias("band_v"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("sig", "cnt", "band.band_i", "band.band_v")
    left = bands.select(
        F.col("sig").alias("sig_a"), F.col("cnt").alias("cnt_a"), "band_i", "band_v"
    )
    right = bands.select(
        F.col("sig").alias("sig_b"), F.col("cnt").alias("cnt_b"), "band_i", "band_v"
    )
    dist = F.bit_count(
        F.col("sig_a").cast("bigint").bitwiseXOR(F.col("sig_b").cast("bigint"))
    )
    between = (
        left.join(right, ["band_i", "band_v"])
        .filter(F.col("sig_a") < F.col("sig_b"))
        .select("sig_a", "sig_b", "cnt_a", "cnt_b")
        .distinct()  # a pair can collide in several bands
        .select(
            dist.cast("int").alias("dist"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("doc_pairs"),
        )
        .filter(F.col("dist") <= _HAMMING_MAX)
        .groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sig_pairs"),
            F.sum("doc_pairs").cast("bigint").alias("n_doc_pairs"),
        )
    )
    within = sigs.agg(
        F.lit(0).cast("int").alias("dist"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sig_pairs"),
        F.coalesce(F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2), F.lit(0))
        .cast("bigint")
        .alias("n_doc_pairs"),
    )
    return within.unionByName(between).orderBy("dist")


# --- Fellegi-Sunter m/u weights ---------------------------------------

_FS_ORACLE = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name FROM part
),
toks AS (
  SELECT name,
         split_part(name, ' ', 1) AS tok1,
         split_part(name, ' ', 2) AS tok2,
         {_SKEL_SQL.format(col="name")} AS skel
  FROM names
),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b,
         CASE WHEN a.tok2 = b.tok2 THEN 1 ELSE 0 END AS is_match,
         CASE WHEN levenshtein(a.tok1, b.tok1) <= 2 THEN 1 ELSE 0 END AS g_edit,
         CASE WHEN length(a.name) = length(b.name) THEN 1 ELSE 0 END AS g_len,
         CASE WHEN a.skel = b.skel THEN 1 ELSE 0 END AS g_skel
  FROM toks a JOIN toks b ON a.name < b.name
),
tot AS (
  SELECT sum(is_match) AS n_m, sum(1 - is_match) AS n_u FROM pairs
),
stats AS (
  SELECT 'edit_dist_le2' AS comparator,
         sum(CASE WHEN is_match = 1 THEN g_edit ELSE 0 END) AS a_m,
         sum(CASE WHEN is_match = 0 THEN g_edit ELSE 0 END) AS a_u
  FROM pairs
  UNION ALL
  SELECT 'same_length',
         sum(CASE WHEN is_match = 1 THEN g_len ELSE 0 END),
         sum(CASE WHEN is_match = 0 THEN g_len ELSE 0 END)
  FROM pairs
  UNION ALL
  SELECT 'same_skeleton',
         sum(CASE WHEN is_match = 1 THEN g_skel ELSE 0 END),
         sum(CASE WHEN is_match = 0 THEN g_skel ELSE 0 END)
  FROM pairs
)
SELECT s.comparator,
       CAST(t.n_m AS BIGINT) AS n_match_pairs,
       CAST(t.n_u AS BIGINT) AS n_unmatch_pairs,
       CASE WHEN t.n_m > 0 THEN CAST(s.a_m AS DOUBLE) / t.n_m END AS m_prob,
       CASE WHEN t.n_u > 0 THEN CAST(s.a_u AS DOUBLE) / t.n_u END AS u_prob,
       CASE WHEN s.a_m > 0 AND s.a_u > 0 THEN
         round(ln((CAST(s.a_m AS DOUBLE) / t.n_m)
                  / (CAST(s.a_u AS DOUBLE) / t.n_u)) / ln(2.0), 6)
       END AS agree_weight,
       CASE WHEN s.a_m < t.n_m AND s.a_u < t.n_u THEN
         round(ln((1 - CAST(s.a_m AS DOUBLE) / t.n_m)
                  / (1 - CAST(s.a_u AS DOUBLE) / t.n_u)) / ln(2.0), 6)
       END AS disagree_weight
FROM stats s CROSS JOIN tot t
ORDER BY s.comparator
"""


@register("fellegi_sunter_weights", oracle=_FS_ORACLE)
def fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record-linkage weights (JASA'69): over the
    vocabulary pair universe (all distinct-name pairs — bounded), with
    'same noun token' as the match truth,
    estimate each comparator's m = P(agree|match) and u =
    P(agree|non-match), and the log2 agreement/disagreement weights a
    probabilistic matcher would score with — the decision-theoretic
    layer on top of `jaro_winkler_toppairs`' raw similarity. All
    probabilities are exact count ratios; weights round once at 6 dp
    (null where a cell is empty — weights are undefined there).

    Comparators: Levenshtein(adjective) <= 2 (both engines implement
    the same DP — integer-exact), equal full-name length, equal
    phonetic skeleton (`phonetic_block_census`'s key).

    Plan shape: the pair space is the blocked vocabulary self-join
    (tiny); three conditional aggregates over it produce the whole
    table. At 100 TB the DISTINCT-name contraction is the only
    row-scale stage — the same posture as every linkage query here."""
    names = (
        table(spark, sf_dir, "part").select(F.col("p_name").alias("name")).distinct()
    )
    toks = names.select(
        "name",
        F.split("name", " ").getItem(0).alias("tok1"),
        F.split("name", " ").getItem(1).alias("tok2"),
        F.expr(_SKEL_SPARK.format(col="name")).alias("skel"),
    )
    a = toks.select(*[F.col(c).alias(c + "_a") for c in toks.columns])
    b = toks.select(*[F.col(c).alias(c + "_b") for c in toks.columns])
    pairs = a.join(
        F.broadcast(b), F.col("name_a") < F.col("name_b")
    ).select(
        F.when(F.col("tok2_a") == F.col("tok2_b"), 1).otherwise(0).alias("is_match"),
        F.when(F.levenshtein("tok1_a", "tok1_b") <= 2, 1)
        .otherwise(0)
        .alias("g_edit"),
        F.when(F.length("name_a") == F.length("name_b"), 1)
        .otherwise(0)
        .alias("g_len"),
        F.when(F.col("skel_a") == F.col("skel_b"), 1).otherwise(0).alias("g_skel"),
    )
    agg = pairs.agg(
        F.sum("is_match").alias("n_m"),
        F.sum(1 - F.col("is_match")).alias("n_u"),
        *[
            F.sum(F.when(F.col("is_match") == m, F.col(g)).otherwise(0)).alias(
                f"{g}_{'m' if m else 'u'}"
            )
            for g in ("g_edit", "g_len", "g_skel")
            for m in (1, 0)
        ],
    ).localCheckpoint()  # consumed once per comparator row
    rows = []
    for comp, g in (
        ("edit_dist_le2", "g_edit"),
        ("same_length", "g_len"),
        ("same_skeleton", "g_skel"),
    ):
        am = F.col(f"{g}_m")
        au = F.col(f"{g}_u")
        m_prob = F.when(F.col("n_m") > 0, am.cast("double") / F.col("n_m"))
        u_prob = F.when(F.col("n_u") > 0, au.cast("double") / F.col("n_u"))
        rows.append(
            agg.select(
                F.lit(comp).alias("comparator"),
                F.col("n_m").cast("bigint").alias("n_match_pairs"),
                F.col("n_u").cast("bigint").alias("n_unmatch_pairs"),
                m_prob.alias("m_prob"),
                u_prob.alias("u_prob"),
                F.when(
                    (am > 0) & (au > 0),
                    F.round(F.log(m_prob / u_prob) / F.log(F.lit(2.0)), 6),
                ).alias("agree_weight"),
                F.when(
                    (am < F.col("n_m")) & (au < F.col("n_u")),
                    F.round(
                        F.log((1 - m_prob) / (1 - u_prob)) / F.log(F.lit(2.0)), 6
                    ),
                ).alias("disagree_weight"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("comparator")


# --- end-to-end entity resolution -------------------------------------

_ER_JW_MIN = 0.82

_ER_ORACLE = f"""
WITH RECURSIVE
names AS (
  SELECT DISTINCT p_name AS name FROM part
),
keys AS (
  SELECT name, {_SKEL_SQL.format(col="name")} AS blk FROM names
),
cand AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM keys a JOIN keys b ON a.blk = b.blk AND a.name < b.name
),
match_pairs AS (
  SELECT name_a, name_b FROM cand
  WHERE jaro_winkler_similarity(name_a, name_b) >= {_ER_JW_MIN}
),
edges AS (
  SELECT name_a AS u, name_b AS v FROM match_pairs
  UNION ALL
  SELECT name_b, name_a FROM match_pairs
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
),
labels AS (SELECT u, min(r) AS entity FROM reach GROUP BY u)
SELECT n.name,
       coalesce(l.entity, n.name) AS entity,
       CAST(count(*) OVER (PARTITION BY coalesce(l.entity, n.name)) AS BIGINT)
         AS n_members
FROM names n LEFT JOIN labels l ON l.u = n.name
ORDER BY n.name
"""


@register("er_pipeline_end2end", oracle=_ER_ORACLE)
def er_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END entity resolution: phonetic-skeleton blocking →
    Jaro-Winkler scoring (>= 0.82) on in-block candidates only →
    connected components → every name labeled with the smallest member
    of its entity cluster — the composite that chains this module's
    stages the way `dedup_pipeline_end2end` chains the MinHash dedup
    stages, against a recursive-CTE transitive-closure oracle. The
    transitive step matters for the same reason it does in dedup:
    pairwise accept/reject over-merges or over-splits when A~B~C but
    A!~C.

    Plan shape: DISTINCT-name contraction (the only row-scale stage),
    vocabulary-bounded block self-join, Arrow-batched comparator on
    candidates, then operators.components.connected_components —
    checkpointed symmetrized edges, one label shuffle per round,
    O(log diameter) rounds. 100 TB posture: unchanged; only the
    DISTINCT scales with the corpus."""
    from ocean_data_pipeline_spark.operators.components import connected_components

    names = (
        table(spark, sf_dir, "part").select(F.col("p_name").alias("name")).distinct()
    )
    # components' decimal convergence scalar needs NUMERIC node ids:
    # dense ids in name order, so min-id == lexicographically-min name
    # and the label maps back to the oracle's min(name) entity.
    ids = names.select(
        "name", F.row_number().over(Window.orderBy("name")).alias("nid")
    ).localCheckpoint()  # consumed by 3 subtrees (2 edge sides + label map)
    keys = ids.select("name", "nid", F.expr(_SKEL_SPARK.format(col="name")).alias("blk"))
    a = keys.select(
        F.col("name").alias("name_a"), F.col("nid").alias("nid_a"),
        F.col("blk").alias("blk_a"),
    )
    b = keys.select(
        F.col("name").alias("name_b"), F.col("nid").alias("nid_b"),
        F.col("blk").alias("blk_b"),
    )
    cand = a.join(
        F.broadcast(b),
        (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")),
    )
    edges = (
        cand.select(
            "nid_a", "nid_b", _jw_udf(F.col("name_a"), F.col("name_b")).alias("jw")
        )
        .filter(F.col("jw") >= _ER_JW_MIN)
        .select(F.col("nid_a").alias("src"), F.col("nid_b").alias("dst"))
    )
    comp = connected_components(edges)
    ent = ids.select(F.col("nid").alias("component"), F.col("name").alias("entity"))
    labels = comp.join(F.broadcast(ent), "component").select("id", "entity")
    return (
        ids.join(labels, ids["nid"] == labels["id"], "left")
        .select(
            "name", F.coalesce(F.col("entity"), F.col("name")).alias("entity")
        )
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("entity")).cast("bigint"),
        )
        .orderBy("name")
    )
