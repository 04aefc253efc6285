"""Product-quantization gates (operators.similarity.pq_topk_frozen +
operators.pq_codebook).

PQ is lossy by design; these tests pin the loss to the useful range:
codes are valid nibbles, reconstruction error is far below the
random-pair distance floor, and ADC recall against the exact L2 top-k
clears a floor (measured ~0.23 @ k=5 on the sf0.01 embeddings —
isotropic unit vectors are PQ's worst case, so the gate sits at half
that).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.pq_codebook import (
    PQ_CODEBOOKS,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
)
from ocean_data_pipeline_spark.operators.similarity import (
    l2_sq,
    pq_encode,
    pq_reconstruct,
    pq_topk_frozen,
)

SF = "/root/testdata/sf0.01"
K = 5
N_PROBES = 25


def test_codebook_contract():
    assert len(PQ_CODEBOOKS) == PQ_M == 8
    for book in PQ_CODEBOOKS:
        assert len(book) == PQ_K == 16
        for c in book:
            assert len(c) == PQ_SUBDIM == 8


def _exact_l2_pairs(emb, probes) -> set[tuple[int, int]]:
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    p = probes.select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("pv"),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", l2_sq(F.col("pv"), F.col("cv")).alias("d2"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= K)
    return {(r["probe_id"], r["neighbor_id"]) for r in top.collect()}


def test_codes_are_valid_nibbles(spark):
    emb = table(spark, SF, "embeddings")
    codes = emb.select(
        pq_encode(F.col("embedding").cast("array<double>"), PQ_CODEBOOKS).alias("codes")
    )
    bad = codes.filter(
        (F.size("codes") != PQ_M)
        | F.exists("codes", lambda c: (c < 0) | (c >= PQ_K))
    ).count()
    assert bad == 0


def test_reconstruction_error_below_random_floor(spark):
    """Mean ||x - x̂||² must sit far below 2.0 — the expected squared
    distance between two independent random unit vectors (cos≈0). If
    quantization were uninformative, x̂ would be as far from x as a
    random point."""
    emb = table(spark, SF, "embeddings")
    v = F.col("embedding").cast("array<double>")
    err = (
        emb.select(
            l2_sq(v, pq_reconstruct(pq_encode(v, PQ_CODEBOOKS), PQ_CODEBOOKS)).alias("e")
        )
        .agg(F.avg("e").alias("mean_err"))
        .collect()[0]["mean_err"]
    )
    assert 0.0 < err < 1.0, f"mean quantization error {err:.4f} out of range"


def test_pq_recall_floor(spark):
    emb = table(spark, SF, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    exact = _exact_l2_pairs(emb, probes)
    pq = {
        (r["probe_id"], r["neighbor_id"])
        for r in pq_topk_frozen(emb, probes, k=K).collect()
    }
    recall = len(pq & exact) / len(exact)
    assert recall >= 0.12, f"PQ recall@{K} degenerate: {recall:.3f}"


def test_pq_rank_contract(spark):
    """Exactly k ranked rows per probe, ranks 1..k, distances
    non-decreasing within a probe."""
    emb = table(spark, SF, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    rows = pq_topk_frozen(emb, probes, k=K).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == {0, 1, 2}
    for pid, rs in by_probe.items():
        assert [r["rank"] for r in rs] == list(range(1, K + 1)), pid
        d = [r["approx_d2"] for r in rs]
        assert d == sorted(d), (pid, d)
