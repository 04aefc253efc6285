"""Multimodal binary-column plumbing tests (SURVEY.md §2-J): schema,
Arrow batch shape through mapInPandas, deterministic stub decode, and
the documented NotImplementedError on the real-codec path.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_image,
    decode_image_stub,
    extract_features,
    pack_binary,
)


@pytest.fixture()
def media_df(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "binary payload stand-in")],
        "doc_id long, text string",
    )
    return pack_binary(docs, "text")


def test_pack_binary_schema(media_df):
    assert media_df.schema["payload"].dataType.typeName() == "binary"
    meta = media_df.schema["media_meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type", "width", "height", "n_frames", "sample_rate",
    ]


def test_extract_features_deterministic(spark, media_df):
    out = extract_features(media_df)
    assert out.schema.simpleString() == spark.createDataFrame([], FEATURE_SCHEMA).schema.simpleString()
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert rows[1]["feature"] == decode_image_stub(b"hello world")
    assert rows[2]["n_bytes"] == 0 and rows[2]["feature"] == [0.0] * 4
    # run twice -> identical (stub is deterministic)
    assert {r["doc_id"]: r["feature"] for r in extract_features(media_df).collect()} == {
        k: r["feature"] for k, r in rows.items()
    }


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
