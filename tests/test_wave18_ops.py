"""Invariant + reference-recompute tests for wave 18 (training-loader
audits): length bucketing efficiency, per-epoch hash-shuffle balance.
"""

from __future__ import annotations

import hashlib
import math
import re

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_length_bucketing_matches_pure_python(spark):
    out = (
        REGISTRY["length_bucketing_efficiency"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("bucket_cap")
    )
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .toPandas()
    )
    buckets: dict[int, list[int]] = {}
    for text in docs.text:
        if text is None or text.strip() == "":
            continue
        n = len([t for t in re.split(r"\s+", text.strip().lower()) if t])
        if n == 0:
            continue
        cap = max(16, 2 ** math.ceil(math.log2(n)))
        buckets.setdefault(cap, []).append(n)
    all_tokens = sum(sum(v) for v in buckets.values())
    all_pad = sum(cap * len(v) - sum(v) for cap, v in buckets.items())
    max_cap = max(buckets)
    n_docs = sum(len(v) for v in buckets.values())
    assert sorted(out.index) == sorted(buckets)
    for cap, v in buckets.items():
        assert out.loc[cap, "n_docs"] == len(v)
        assert out.loc[cap, "tokens"] == sum(v)
        assert out.loc[cap, "padding"] == cap * len(v) - sum(v)
    got_b = out["bucketed_efficiency"].iloc[0]
    got_u = out["unbucketed_efficiency"].iloc[0]
    assert abs(got_b - all_tokens / (all_tokens + all_pad)) < 1e-6
    assert abs(got_u - all_tokens / (max_cap * n_docs)) < 1e-6
    # bucketing can only help vs pad-to-global-max
    assert got_b >= got_u
    assert ((out["bucket_efficiency"] > 0) & (out["bucket_efficiency"] <= 1)).all()


def test_epoch_shuffle_matches_hashlib_and_decorrelates(spark):
    out = (
        REGISTRY["epoch_shuffle_balance"]
        .fn(spark, SF_ORACLE)
        .toPandas()
        .set_index("epoch")
    )
    ids = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id")
        .toPandas()
        .doc_id.tolist()
    )

    def shard(e, d):
        h = hashlib.sha256(f"epoch{e}:{d}".encode()).hexdigest()
        return int(h[:6], 16) % 16

    assigns = {}
    for e in (0, 1, 2):
        counts = [0] * 16
        for d in ids:
            counts[shard(e, d)] += 1
        assigns[e] = counts
        n = sum(counts)
        chi = sum((o - n / 16) ** 2 / (n / 16) for o in counts)
        assert out.loc[e, "n_docs"] == n
        assert out.loc[e, "min_shard"] == min(counts)
        assert out.loc[e, "max_shard"] == max(counts)
        assert abs(out.loc[e, "chi_sq_uniform"] - chi) < 1e-4
        # uniformity: chi-square df=15, p>0.001 bound (~37.7)
        assert chi < 37.7, (e, chi)
    # epochs are genuinely different permutations: per-doc shards differ
    moved = sum(1 for d in ids if shard(0, d) != shard(1, d))
    assert moved / len(ids) > 0.8
