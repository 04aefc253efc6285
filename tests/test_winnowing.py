"""Winnowing fingerprint properties (operators.text.winnow_fingerprints).

The winnowing guarantee (Schleimer et al., SIGMOD'03): with k-gram
hashes and window w, any shared substring of length >= k + w - 1
produces at least one shared fingerprint between the two documents.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.text import (
    doc_fingerprint,
    rolling_hashes,
    winnow_fingerprints,
)

K, W = 16, 8
GUARANTEE_LEN = K + W - 1  # 23


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def _fps(spark, texts: list[str]) -> list[list[int]]:
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(winnow_fingerprints(F.col("text"), k=K, w=W).alias("fp")).collect()
    return [r["fp"] for r in rows]


def test_shared_substring_guarantees_shared_fingerprint(spark):
    rng = random.Random(7)
    for trial in range(10):
        shared = _rand_text(rng, GUARANTEE_LEN + rng.randrange(20))
        a = _rand_text(rng, 40) + shared + _rand_text(rng, 40)
        b = _rand_text(rng, 60) + shared + _rand_text(rng, 25)
        fa, fb = _fps(spark, [a, b])
        assert set(fa) & set(fb), f"trial {trial}: no shared fingerprint"


def test_winnowed_subset_of_rolling_and_contains_global_min(spark):
    rng = random.Random(11)
    texts = [_rand_text(rng, 30 + rng.randrange(100)) for _ in range(8)]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        winnow_fingerprints(F.col("text"), k=K, w=W).alias("fp"),
        rolling_hashes(F.col("text"), k=K).alias("all_h"),
        doc_fingerprint(F.col("text"), k=K).alias("gmin"),
    ).collect()
    for r in rows:
        assert set(r["fp"]) <= set(r["all_h"])
        assert r["gmin"] in r["fp"]  # global min survives winnowing
        assert r["fp"] == sorted(set(r["fp"]))  # distinct + sorted contract


def test_short_text_yields_single_fingerprint(spark):
    # len < k: one truncated-gram hash; len < k+w-1: min over all hashes
    (short, mid) = _fps(spark, ["abc", "a" * (K + 2)])
    assert len(short) == 1
    assert len(mid) == 1
