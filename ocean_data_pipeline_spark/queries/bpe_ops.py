"""BPE merge learning (Sennrich et al. 2016) — tokenizer TRAINING at
corpus scale, not just tokenization (token_counts_bpe applies a
BPE-ish regex; this LEARNS the merge table).

Algorithm: words → space-separated symbol sequences (chars + '_'
end-of-word marker), then k rounds of {count adjacent symbol pairs
weighted by word frequency → merge the most frequent pair (ties by
pair string) in every sequence}. Pair merging is string replace on the
space-delimited form — ' a b ' → ' ab ' — whose left-to-right
non-overlapping semantics IS BPE's merge rule (both engines' replace()
agree, so 'a a a' merges to 'aa a', never 'a aa').

Spark side: a k-round driver loop — each round is one distributed
pair-count aggregation over the (distinct-word, freq) relation plus a
broadcast single-pair replace projection; the only driver crossing is
the 1-row argmax per round (the components.py bounded-scalar pattern).
Word-frequency contraction first: the corpus enters once, the loop
runs on DISTINCT words — at 100 TB the loop input is vocabulary-sized.

Oracle: a GENERATED k-round unrolled DuckDB SQL (the k-core
generated-peel precedent) — same counting, same argmax tiebreak, same
replace. The unroll bound pins the formulations to each other; a
divergence in any round breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import register

_K = 6
#: oracle adjacent-pair index bound: symbols per word = chars + marker
#: ≤ 9 in this corpus (max word length 8, asserted in tests); 40 keeps
#: headroom and the generate_series constant-bounded.
_MAX_SYMS = 40

_NORM = (
    "trim(regexp_replace(regexp_replace(lower(trim(text)),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)


def _duck_oracle(k: int) -> str:
    parts = [
        f"""
words0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array({_NORM}, ' ')) AS word
        FROM documents WHERE length(trim(text)) > 0) t
  WHERE length(word) > 0
  GROUP BY word
),
r0 AS (
  SELECT ' ' || regexp_replace(word || '_', '(.)', '\\1 ', 'g') AS s, freq
  FROM words0
)"""
    ]
    selects = []
    for i in range(1, k + 1):
        parts.append(
            f"""
p{i} AS (
  SELECT list_extract(a, k) || ' ' || list_extract(a, k + 1) AS pair,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT regexp_split_to_array(trim(s), ' ') AS a, freq FROM r{i-1}) t
  JOIN (SELECT unnest(generate_series(1, {_MAX_SYMS})) AS k) ks ON ks.k < len(a)
  GROUP BY 1
),
b{i} AS (SELECT pair, cnt FROM p{i} ORDER BY cnt DESC, pair LIMIT 1),
r{i} AS (
  SELECT replace(s, ' ' || (SELECT pair FROM b{i}) || ' ',
                 ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' ') AS s,
         freq
  FROM r{i-1}
)"""
        )
        selects.append(
            f"SELECT {i} AS merge_rank, pair, replace(pair, ' ', '') AS merged,"
            f" cnt AS pair_count FROM b{i}"
        )
    return (
        "WITH "
        + ",".join(parts)
        + "\n"
        + " UNION ALL ".join(selects)
        + " ORDER BY merge_rank"
    )


BPE_ORACLE = _duck_oracle(_K)


@register("bpe_learn_merges", oracle=BPE_ORACLE)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-6 BPE merges from the document corpus: word-freq
    contraction, then per round one pair-count shuffle + a broadcast
    replace; only the 1-row argmax crosses to the driver each round."""
    docs = table(spark, sf_dir, "documents", spread=True).where(
        F.length(F.trim("text")) > 0
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.trim("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    words = (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # Materialize the word-frequency contraction ONCE (round-11, guide
    # §2.4/§5): without this checkpoint every merge round's pair-count
    # action re-derives the whole upstream chain — corpus scan + two
    # regexp normalizations + the word-count shuffle — because `r` is
    # rebuilt lazily under each round's collect. The contraction is
    # word-vocabulary-scale (tiny next to the corpus), so the loop cost
    # drops from K × (corpus scan + normalize) to ONE contraction plus
    # K vocabulary-scale pair counts. Measured at sf0.1: 5.2 → 2.8 s.
    r = words.select(
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.concat(F.col("word"), F.lit("_")), "(.)", "$1 "),
        ).alias("s"),
        "freq",
    ).localCheckpoint()
    learned: list[tuple[int, str, str, int]] = []
    for i in range(1, _K + 1):
        arr = r.select(F.split(F.trim("s"), " ").alias("a"), "freq")
        pairs = arr.select(
            F.posexplode(F.slice("a", 1, F.size("a") - 1)).alias("k0", "sym"),
            "a",
            "freq",
        ).select(
            F.concat("sym", F.lit(" "), F.element_at("a", F.col("k0") + 2)).alias(
                "pair"
            ),
            "freq",
        )
        cnts = pairs.groupBy("pair").agg(F.sum("freq").cast("bigint").alias("cnt"))
        best_rows = cnts.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()
        if not best_rows:  # empty corpus / merges exhausted: stay total
            break
        best = best_rows[0]
        learned.append((i, best.pair, best.pair.replace(" ", ""), int(best.cnt)))
        r = r.select(
            F.replace(
                F.col("s"),
                F.lit(f" {best.pair} "),
                F.lit(" " + best.pair.replace(" ", "") + " "),
            ).alias("s"),
            "freq",
        )
    return spark.createDataFrame(
        learned, "merge_rank INT, pair STRING, merged STRING, pair_count BIGINT"
    ).orderBy("merge_rank")
