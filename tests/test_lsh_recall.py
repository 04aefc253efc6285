"""LSH quality gates: the rows-only approximate dedup/similarity paths
must actually FIND what the exact (oracle-checked) methods find —
recall bounds make "rows-only" mean something.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.dedup import (
    candidate_pairs,
    jaccard_pairs,
    mllib_minhash_pairs,
)
from tests.conftest import SF_ORACLE

THRESH = 0.8


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF_ORACLE, "documents").filter(
        (F.col("doc_id") < 60) & (F.length(F.trim(F.col("text"))) > 0)
    )


@pytest.fixture(scope="module")
def exact_pairs(spark, docs):
    """Ground truth: token-set Jaccard >= THRESH over all subset pairs."""
    ids = docs.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    out = jaccard_pairs(docs, "text", "doc_id", pairs, n=1)
    # strictly above: approxSimilarityJoin keeps dist < (1 − THRESH),
    # so exact-boundary pairs (j == THRESH) are excluded by contract,
    # not by approximation error.
    return {
        (r["id_a"], r["id_b"])
        for r in out.filter(F.col("jaccard") > THRESH + 1e-9).collect()
    }


def test_mllib_lsh_recall(spark, docs, exact_pairs):
    """approxSimilarityJoin candidates + exact keyDistance: recall vs the
    true >= 0.8 pairs should be near-total (8 OR'd tables: candidate
    miss prob <= (1-j)^8 <= 0.2^8)."""
    assert len(exact_pairs) > 10, "fixture lost its near-dup structure"
    got = {
        (r["id_a"], r["id_b"])
        for r in mllib_minhash_pairs(docs, "text", "doc_id", threshold=THRESH).collect()
    }
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"LSH recall {recall:.3f} over {len(exact_pairs)} true pairs"


def test_banded_candidates_cover_duplicates(spark, docs):
    """Banded-MinHash candidates must include every (original, copy)
    pair — identical text gives identical shingle sets, hence equal min
    hashes in EVERY band, by construction."""
    copies = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    with_dups = docs.select("doc_id", "text").unionByName(copies)
    cand = {
        (r["id_a"], r["id_b"])
        for r in candidate_pairs(with_dups, "text", "doc_id").collect()
    }
    originals = [r["doc_id"] for r in docs.select("doc_id").collect()]
    missed = [(i, i + 10_000) for i in originals if (i, i + 10_000) not in cand]
    assert not missed, f"banding missed exact-duplicate pairs: {missed[:5]}"
