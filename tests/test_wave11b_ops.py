"""Invariant tests for the second wave-11 batch: Fellegi-Sunter
weights, Markov entropy rate, Chao1/Good-Turing, Kneser-Ney LM,
Nelson-Aalen hazard, equi-depth histogram, grouped PAVA, streaming
HLL, hard-negative mining. Oracle parity pins exact values; these pin
the semantic contracts — probability closure, monotonicity, estimator
bounds, micro-batch invariance.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_fellegi_sunter_structure(spark):
    rows = REGISTRY["fellegi_sunter_weights"].fn(spark, SF_ORACLE).collect()
    assert {r.comparator for r in rows} == {
        "edit_dist_le2", "same_length", "same_skeleton"
    }
    n_names = (
        table(spark, SF_ORACLE, "part").select("p_name").distinct().count()
    )
    for r in rows:
        assert r.n_match_pairs + r.n_unmatch_pairs == n_names * (n_names - 1) // 2
        assert 0.0 <= r.m_prob <= 1.0 and 0.0 <= r.u_prob <= 1.0
        if r.agree_weight is not None:
            # agreement weight sign == sign of (m - u)
            assert (r.agree_weight > 0) == (r.m_prob > r.u_prob) or math.isclose(
                r.m_prob, r.u_prob, abs_tol=1e-12
            )
    # at least one comparator must actually discriminate
    assert any(r.m_prob > r.u_prob for r in rows)


def test_entropy_rate_bounds(spark):
    r = REGISTRY["entropy_rate_markov"].fn(spark, SF_ORACLE).collect()[0]
    n_types = (
        table(spark, SF_ORACLE, "events").select("event_type").distinct().count()
    )
    assert -1e-9 <= r.h_rate <= r.h_marginal + 3e-6, "conditioning cannot add entropy"
    assert r.h_marginal <= math.log(n_types) + 1e-9
    assert abs(r.predictability_gain - (r.h_marginal - r.h_rate)) < 3e-6


def test_chao1_bounds(spark):
    rows = REGISTRY["chao1_vocab_richness"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.chao1_richness >= r.observed_vocab - 1e-9
        assert 0.0 <= r.good_turing_coverage <= 1.0
        assert r.n_tokens >= r.observed_vocab >= r.singletons


def test_kneser_ney_probability_closure(spark):
    """Sum_w2 P_KN(w2|w1) == 1 over the full bigram-type vocabulary —
    the mass-conservation property that distinguishes KN from an
    unnormalized discount. Recomputed in pure Python from the census."""
    from ocean_data_pipeline_spark.operators.text import tokens

    d = (
        table(spark, SF_SMOKE, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(tokens(F.lower(F.col("text"))).alias("arr"))
        .toPandas()
    )
    from collections import Counter, defaultdict

    uni = Counter()
    big = Counter()
    for arr in d.arr:
        uni.update(arr)
        big.update(zip(arr[:-1], arr[1:]))
    npost = defaultdict(set)
    npre = defaultdict(set)
    for w1, w2 in big:
        npost[w1].add(w2)
        npre[w2].add(w1)
    B = len(big)
    D = 0.75
    hist = Counter()
    for (a, b), c in big.items():
        hist[a] += c
    w1 = max(npost, key=lambda w: len(npost[w]))  # most versatile history
    total = sum(
        max(big[(w1, w2)] - D, 0) / hist[w1]
        + (D * len(npost[w1]) / hist[w1]) * (len(npre[w2]) / B)
        for w2 in npre  # all continuations in the model
    )
    assert abs(total - 1.0) < 1e-9, total
    # and the registered query runs with sane output
    rows = REGISTRY["kneser_ney_bigram_ppl"].fn(spark, SF_SMOKE).collect()
    assert rows and all(r.min_nll <= r.avg_nll <= r.max_nll for r in rows)
    assert all(r.avg_nll > 0 for r in rows)


def test_nelson_aalen_monotone_and_dominates_variance(spark):
    rows = REGISTRY["nelson_aalen_hazard"].fn(spark, SF_ORACLE).collect()
    assert rows
    hz = [r.cum_hazard for r in rows]
    assert hz == sorted(hz), "cumulative hazard must be nondecreasing"
    for r in rows:
        assert 0 < r.n_events <= r.n_risk
        assert r.hazard_var <= r.cum_hazard + 1e-12  # d/n^2 <= d/n termwise


def test_equi_depth_histogram_partitions_rows(spark):
    rows = REGISTRY["equi_depth_histogram"].fn(spark, SF_ORACLE).collect()
    total = table(spark, SF_ORACLE, "orders").count()
    assert sum(r.n_rows for r in rows) == total
    assert [r.bin for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a.hi_value < b.lo_value, "bins must not overlap"
    # equi-depth: no bin more than 2x the ideal depth (ties can skew)
    ideal = total / len(rows)
    assert max(r.n_rows for r in rows) <= 2 * ideal


def test_grouped_pava_monotone_per_group(spark):
    rows = REGISTRY["isotonic_pava_grouped"].fn(spark, SF_ORACLE).collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append((r.discount_pct, r.iso_qty))
    for flag, pairs in by_flag.items():
        fitted = [q for _, q in sorted(pairs)]
        assert fitted == sorted(fitted), flag


def test_hard_negative_mining_contract(spark):
    rows = REGISTRY["hard_negative_mining"].fn(spark, SF_ORACLE).collect()
    by_anchor = {}
    for r in rows:
        assert r.anchor_label != r.negative_label
        assert -1.0 - 1e-9 <= r.cosine_sim <= 1.0 + 1e-9
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for aid, rs in by_anchor.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3]
        sims = [r.cosine_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True), aid


def test_stream_hll_multibatch_matches_batch(spark, tmp_path):
    """Register state after multi-batch streaming == batch registers:
    max-merge is slicing-invariant (and duplicate-safe)."""
    import time as _t

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_type")
        .orderBy("ts")
        .toPandas()
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    half = len(ev) // 2
    src = tmp_path / "hll_src"
    src.mkdir()
    ev.iloc[:half].to_parquet(src / "part0.parquet", index=False)
    _t.sleep(1.1)
    # overlap: re-deliver some rows in batch 2 — max-merge must absorb
    ev.iloc[half - 50 :].to_parquet(src / "part1.parquet", index=False)

    hexd = F.sha2(F.concat(F.lit("shll_"), F.col("user_id").cast("string")), 256)
    reg = (F.conv(F.substring(hexd, 1, 2), 16, 10).cast("int") % 64).alias("reg")
    v40 = F.conv(F.substring(hexd, 3, 10), 16, 10).cast("bigint")
    rho = F.lit(41)
    for r in range(40, 0, -1):
        rho = F.when(v40 >= (1 << (40 - r)), F.lit(r)).otherwise(rho)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    registers = (
        stream.select("event_type", reg, rho.cast("int").alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m_reg"))
    )
    sink = "stream_hll_multibatch_test"
    q = (
        registers.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2
    got = {
        (r.event_type, r.reg): r.m_reg for r in spark.table(sink).collect()
    }
    want = {
        (r.event_type, r.reg): r.m_reg
        for r in spark.read.parquet(str(src))
        .select("event_type", reg, rho.cast("int").alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m_reg"))
        .collect()
    }
    assert got == want
