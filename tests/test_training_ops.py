"""Training-data ops: coverage/determinism properties that the hash
oracle can't express — every token is covered by some chunk, chunk
overlap equals window−stride, split membership is partition-invariant,
and packing never splits a document."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.chunking import chunk_by_tokens
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_chunks_cover_every_token(spark):
    docs = table(spark, SF_ORACLE, "documents").filter(F.col("doc_id") < 50)
    chunks = chunk_by_tokens(docs, window=30, stride=20)
    # sum of per-doc token counts == per-doc max(start + n_tokens):
    # the last chunk must reach the document's end
    got = (
        chunks.groupBy("doc_id")
        .agg(F.max(F.col("chunk_id") * 20 + F.col("n_tokens")).alias("covered"))
    )
    want = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    diff = got.join(want, "doc_id").filter(F.col("covered") != F.col("n"))
    assert diff.count() == 0


def test_chunk_overlap_is_window_minus_stride(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(75)))], "doc_id long, text string"
    )
    rows = {r["chunk_id"]: r for r in chunk_by_tokens(docs, 30, 20).collect()}
    assert rows[0]["chunk_text"].split()[20:] == rows[1]["chunk_text"].split()[:10]
    assert rows[3]["n_tokens"] == 75 - 60  # short tail kept


def test_split_is_partition_invariant(spark):
    q = REGISTRY["train_test_split_deterministic"].fn
    a = q(spark, SF_ORACLE).collect()
    # same computation over a differently-partitioned input must agree
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = q(spark, SF_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r["split"]: r["n_docs"] for r in a}
    assert counts["train"] + counts["test"] == 500
    assert 0 < counts["test"] < counts["train"]  # ~10% bucket


def test_packing_preserves_docs_and_tokens(spark):
    out = REGISTRY["pack_token_budget"].fn(spark, SF_ORACLE)
    docs = table(spark, SF_ORACLE, "documents")
    tot = out.agg(
        F.sum("n_docs").alias("docs"), F.sum("bin_tokens").alias("toks")
    ).collect()[0]
    want_docs = docs.count()
    want_toks = docs.select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert tot["docs"] == want_docs and tot["toks"] == want_toks
