"""Property tests for the quality_ops / event_analytics operators —
the invariants the DuckDB oracle parity cannot express (statistical
behavior of the A-ES sampler, window-vs-agg argmax equivalence,
run-length reconstruction, calibration error bounds).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


# --- A-ES weighted sampling -------------------------------------------


def _es_sample(spark, salt: str, k: int, n: int, heavy_weight: int):
    """Sample k of n ids where id 0 has weight `heavy_weight` and the
    rest weight 1, using the same hash→key construction as the query."""
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") == 0, heavy_weight).otherwise(1).alias("w"),
    )
    u = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(salt), F.col("id").cast("string")), 256), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    keyed = df.select("id", "w", (-F.log(u) / F.col("w")).alias("es_key"))
    return [
        r.id for r in keyed.orderBy("es_key", "id").limit(k).collect()
    ]


def test_aes_sampler_weight_proportional(spark):
    """An item with weight W among unit weights must enter a k-of-n
    A-ES sample with probability ≈ its weighted share — check by
    resampling over many salts."""
    hits = 0
    trials = 60
    for t in range(trials):
        sample = _es_sample(spark, f"trial{t}_", k=5, n=100, heavy_weight=50)
        hits += 0 in sample
    # Weighted inclusion probability for the heavy item is ~1 - prod
    # over draws ≈ 0.85-0.95 here; unit items sit near 5/150. The
    # heavy item must be sampled FAR more often than a unit item.
    assert hits / trials > 0.5, f"heavy item sampled only {hits}/{trials}"


def test_aes_sampler_deterministic(spark):
    s1 = _es_sample(spark, "fixed_", k=10, n=200, heavy_weight=7)
    s2 = _es_sample(spark, "fixed_", k=10, n=200, heavy_weight=7)
    assert s1 == s2


def test_aes_sampler_partition_invariant(spark):
    """The sample must not depend on input partitioning."""
    df = spark.range(300)
    ids = []
    for parts in (1, 7):
        u = (
            F.conv(
                F.substring(
                    F.sha2(F.concat(F.lit("p_"), F.col("id").cast("string")), 256),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            + 1
        ) / F.lit(4294967297.0)
        keyed = df.repartition(parts).select(
            "id", (-F.log(u) / F.lit(1.0)).alias("es_key")
        )
        ids.append([r.id for r in keyed.orderBy("es_key", "id").limit(20).collect()])
    assert ids[0] == ids[1]


# --- argmax-by-struct vs window row_number ----------------------------


def test_struct_max_equals_window_argmax(spark):
    """max(struct(value, event_id, event_type)) per user must pick the
    same row as the row_number()-over-(value desc, event_id desc)
    window — the agg formulation is just the shuffle-cheaper plan."""
    ev = REGISTRY["peak_event_per_user"]  # ensure registered
    assert ev is not None
    from ocean_data_pipeline_spark.catalog import table

    events = table(spark, SF_ORACLE, "events")
    agg_side = (
        events.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("value").alias("v"),
                    F.col("event_id").alias("e"),
                    F.col("event_type").alias("t"),
                )
            ).alias("peak")
        )
        .select("user_id", F.col("peak.e").alias("event_id"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.desc("event_id"))
    win_side = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )
    assert agg_side.subtract(win_side).count() == 0
    assert win_side.subtract(agg_side).count() == 0


# --- gaps-and-islands reconstruction ----------------------------------


def test_run_lengths_reconstruct_sequence(spark):
    """On a hand-built sequence the island trick must recover the
    exact run structure: A A B A A A B B → runs A:2, B:1, A:3, B:2."""
    rows = [
        (1, i, t)
        for i, t in enumerate(["A", "A", "B", "A", "A", "A", "B", "B"])
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    w_all = Window.partitionBy("user_id").orderBy("ts")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts")
    runs = (
        df.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    got = sorted(
        (r.event_type, r.run_len) for r in runs.collect()
    )
    assert got == [("A", 2), ("A", 3), ("B", 1), ("B", 2)]


# --- funnel ordering semantics ----------------------------------------


def test_funnel_requires_strict_ordering(spark):
    """A user who purchases BEFORE viewing must not count as converted;
    one who does view → click → purchase in order must."""
    rows = [
        # user 1: purchase first, then view — no conversion past view
        (1, "2024-01-01 00:00:00", "purchase", 100),
        (1, "2024-01-02 00:00:00", "view", 101),
        # user 2: proper order
        (2, "2024-01-01 00:00:00", "view", 200),
        (2, "2024-01-02 00:00:00", "click", 201),
        (2, "2024-01-03 00:00:00", "purchase", 202),
        # user 3: click before view — click must not count
        (3, "2024-01-02 00:00:00", "click", 300),
        (3, "2024-01-03 00:00:00", "view", 301),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts_s", "event_type", "event_id"]
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "event_id")
    v = (
        df.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        df.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        df.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    assert sorted(r.user_id for r in v.collect()) == [1, 2, 3]
    assert [r.user_id for r in c.collect()] == [2]
    assert [r.user_id for r in p.collect()] == [2]


# --- MinHash calibration error bound ----------------------------------


def test_minhash_calibration_within_theory(spark, duck):
    """Measured MAE of the K=16 estimator must sit within ~2× the
    theoretical sqrt(J(1-J)/K) bound for the panel's typical J — a
    broken hash or banding scheme blows straight past it."""
    row = (
        REGISTRY["minhash_jaccard_calibration"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    # panel J is near 0: bound ~ sqrt(0.1*0.9/16) ≈ 0.075; 2× slack
    assert row.mae <= 2 * math.sqrt(0.25 / 16), row.mae
    assert abs(row.bias) <= row.mae
    assert row.n_pairs == 60 * 59 // 2


# --- bigram LM sanity --------------------------------------------------


def test_bigram_nll_bounded_by_unigram_entropy(spark):
    """With λ-interpolation against the unigram LM, every document's
    bigram NLL must be ≤ the worst-case -ln(0.3·min_unigram_prob) and
    > 0; and the corpus-average bigram NLL should not exceed the
    unigram query's average (sequence context can only help on real
    text)."""
    big = REGISTRY["bigram_perplexity_interp"].fn(spark, SF_ORACLE).collect()
    uni = REGISTRY["perplexity_filter_unigram"].fn(spark, SF_ORACLE).collect()
    big_avg = sum(r.avg_nll * r.n_docs for r in big) / sum(r.n_docs for r in big)
    uni_avg = sum(r.avg_nll * r.n_docs for r in uni) / sum(r.n_docs for r in uni)
    assert 0 < big_avg <= uni_avg + 0.05
    for r in big:
        assert r.max_nll > 0


# --- retention cohort invariants --------------------------------------


def test_retention_offsets_nonnegative_and_cohort0_complete(spark):
    rows = REGISTRY["weekly_retention_cohorts"].fn(spark, SF_ORACLE).collect()
    assert all(r.week_offset >= 0 for r in rows)
    # offset-0 cell of each cohort must include every cohort member
    # that was ever seen (their first event is in that week)
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active_users
    for cohort, cells in by_cohort.items():
        assert 0 in cells, f"cohort {cohort} missing offset-0 cell"
        assert cells[0] == max(cells.values()), (
            f"cohort {cohort}: offset-0 must be the largest cell"
        )


# --- LSH band tuning: measured detection ≈ analytic expectation -------


def test_band_tuning_measured_matches_theory(spark):
    """For each (b, r) config the measured candidate count must track
    the analytic expectation Σ 1-(1-J^r)^b. Tolerance is RATIO-based
    (within [0.5x, 1.5x] where the expectation is ≥ 10): every pair
    shares the SAME K=16 salts, so pair detections are strongly
    correlated and the independent-pair 3·sqrt(E) band does NOT apply
    — a salt that happens to rank a widely-shared shingle low moves
    hundreds of pairs together (verified: the per-pair estimator is
    unbiased at 20k salts; the corpus-wide sum at a fixed small K
    fluctuates far beyond sqrt(E))."""
    rows = REGISTRY["minhash_band_tuning_curve"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 3
    for r in rows:
        if r.expected_detected >= 10:
            ratio = r.n_detected / r.expected_detected
            assert 0.5 <= ratio <= 1.5, (
                f"(b={r.n_bands}, r={r.rows_per_band}): measured {r.n_detected} "
                f"vs expected {r.expected_detected}"
            )
        else:
            assert r.n_detected <= 10 + 5 * r.expected_detected
    # monotonicity: more selective banding (higher r) detects fewer
    by_r = {r.rows_per_band: r.n_detected for r in rows}
    assert by_r[1] >= by_r[2] >= by_r[4]


# --- DSIR: target-slice documents must score higher -------------------


def test_dsir_target_docs_score_positive(spark, duck):
    """lang='en' documents ARE the target distribution, so their mean
    log-weight must exceed the non-target mean (and be positive)."""
    from ocean_data_pipeline_spark.queries.quality_ops import _DSIR_ORACLE

    per_doc_sql = _DSIR_ORACLE.split("SELECT source,")[0] + (
        "SELECT s.doc_id, s.logw, d.lang FROM scored s "
        "JOIN documents d ON d.doc_id = s.doc_id"
    )
    pdf = duck.execute(per_doc_sql).df()
    en = pdf[pdf.lang == "en"].logw.mean()
    rest = pdf[pdf.lang != "en"].logw.mean()
    assert en > 0 > rest
    assert en > rest


# --- SemDeDup / balanced sampling / purity invariants -----------------


def test_semantic_dedup_cell_invariants(spark):
    rows = REGISTRY["semantic_dedup_cells"].fn(spark, SF_ORACLE).collect()
    assert sum(r.n_vecs for r in rows) == 500  # every vector assigned once
    for r in rows:
        assert 0 <= r.n_dup_vecs <= r.n_vecs
        max_pairs = r.n_vecs * (r.n_vecs - 1) // 2
        assert 0 <= r.n_dup_pairs <= max_pairs
        if r.n_dup_pairs:
            assert r.n_dup_vecs >= 2


def test_balanced_sampling_caps_cells(spark):
    rows = REGISTRY["cluster_balanced_sampling"].fn(spark, SF_ORACLE).collect()
    for r in rows:
        assert r.n_kept == min(20, r.n_vecs)


def test_cell_purity_entropy_consistency(spark):
    rows = REGISTRY["cell_label_purity"].fn(spark, SF_ORACLE).collect()
    for r in rows:
        assert 0.0 <= r.purity <= 1.0
        assert r.label_entropy >= -1e-9
        if r.n_labels == 1:
            assert r.purity == 1.0 and abs(r.label_entropy) < 1e-9
        else:
            assert r.label_entropy > 0
        # entropy bounded by ln(n_labels)
        assert r.label_entropy <= math.log(r.n_labels) + 1e-9
