"""Multimodal-column operators (SURVEY.md §2-J multimodal-cols).

Design: image/audio/video payloads travel the pipeline as opaque
`binary` columns with a typed metadata struct alongside; the Spark-side
plumbing (schema, partition sizing, Arrow batch shape through
mapInPandas) is real and tested. Actual media decoding depends on
codec libraries not present in this environment, so the decode kernels
are STUBS: `decode_image_stub` produces deterministic fake features
(so tests are reproducible) and `decode_image` raises
NotImplementedError with the integration point documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metadata struct carried next to every binary payload.
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<double>"


def pack_binary(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """Make an opaque binary payload column + metadata struct from any
    source column (here: text bytes stand in for media bytes).

    At scale: binaries skew partition sizes — repartition by id so
    `spark.sql.files.maxPartitionBytes` stays meaningful downstream.
    """
    return df.select(
        F.col(id_col),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).alias("sample_rate"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes) -> list[float]:
    """Real decode kernel — NOT available in this environment.

    Integration point: swap in PIL/av/librosa here; the Spark plumbing
    (mapInPandas batching below) is unchanged by the codec choice.
    """
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use decode_image_stub (deterministic fake) or install a codec"
    )


def decode_image_stub(payload: bytes, dims: int = 4) -> list[float]:
    """Deterministic fake 'decoder': fixed-length feature from payload
    bytes (mean/len/first/last) — stable across runs and machines."""
    if payload is None or len(payload) == 0:
        return [0.0] * dims
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 997),
    ][:dims]


def extract_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each worker receives pandas batches of (doc_id,
    payload, meta) — the right shape for feeding a native decoder
    without per-row Python overhead.
    """
    decode = decode_image_stub if use_stub else decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [decode(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
