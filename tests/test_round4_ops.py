"""Structural properties of the round-4 additions that the value
oracles can't see: key bijectivity, mass conservation, sweep-line
closure — checked on the smoke-scale tables where exact recomputation
is cheap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all

SF = "/root/testdata/sf0.001"
REGISTRY = load_all()


def test_zorder_key_bijective_on_grid(spark):
    """The Morton key must be a bijection over the full 91x61 grid —
    a collision would merge unrelated cells into one layout bucket."""
    from ocean_data_pipeline_spark.queries.grid_queries import zorder_key

    grid = spark.range(91).select(F.col("id").alias("lat_idx")).crossJoin(
        spark.range(61).select(F.col("id").alias("lon_idx"))
    )
    keyed = grid.select(zorder_key(F.col("lat_idx"), F.col("lon_idx")).alias("z"))
    row = keyed.agg(
        F.countDistinct("z").alias("n"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).collect()[0]
    assert row["n"] == 91 * 61
    assert row["lo"] >= 0 and row["hi"] < 2**14


def test_span_census_conserves_span_mass(spark):
    """Sum of per-source span counts == sum over docs of
    ceil(n_tokens/16): no span lost or double-counted by the census
    join."""
    out = REGISTRY["span_dedup_census"].fn(spark, SF).agg(F.sum("n_spans")).collect()
    expected = (
        table(spark, SF, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            F.ceil(
                F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) / F.lit(16.0)
            ).alias("k")
        )
        .agg(F.sum("k"))
        .collect()
    )
    assert out[0][0] == expected[0][0]


def test_concurrency_sweep_closes(spark):
    """Every session contributes one +1 and one -1, so the boundary
    census is even and the per-day maxima are >= 1 wherever boundaries
    exist."""
    rows = REGISTRY["session_concurrency_profile"].fn(spark, SF).collect()
    assert rows, "no sessions at smoke scale?"
    assert sum(r["n_boundary_events"] for r in rows) % 2 == 0
    assert all(r["max_concurrent"] >= 1 for r in rows)
    assert all(r["avg_concurrent"] >= 0 for r in rows)


def test_perplexity_covers_all_docs(spark):
    """Per-source doc counts add to the non-empty corpus size; flags
    never exceed docs; NLL is positive (probabilities < 1)."""
    rows = REGISTRY["perplexity_filter_unigram"].fn(spark, SF).collect()
    n_docs = (
        table(spark, SF, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["n_flagged"] <= r["n_docs"] for r in rows)
    assert all(r["avg_nll"] > 0 for r in rows)


def test_quality_decile_retention_bounds(spark):
    """Dropping the bottom decile must keep 85-95% of each lang bucket
    (ntile guarantees bucket sizes within one of each other)."""
    rows = REGISTRY["quality_decile_filter"].fn(spark, SF).collect()
    for r in rows:
        frac = r["n_kept"] / r["n_docs"]
        assert 0.80 <= frac <= 0.95, (r["lang"], frac)


def test_leakage_categories_partition_pairs(spark):
    """Every confirmed near-dup pair lands in exactly one category and
    example keys decode to a valid (a < b) pair."""
    rows = REGISTRY["split_leakage_audit"].fn(spark, SF).collect()
    for r in rows:
        assert r["category"] in {"train-train", "test-test", "cross-split"}
        a, b = divmod(r["example_pair_key"], 1000000)
        assert a < b
