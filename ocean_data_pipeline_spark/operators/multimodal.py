"""Multimodal-column operators (SURVEY.md §2-J multimodal-cols).

Design: image/audio/video payloads travel the pipeline as opaque
`binary` columns with a typed metadata struct alongside; the Spark-side
plumbing (schema, partition sizing, Arrow batch shape through
mapInPandas) is real and tested.

The decode layer is split by what this environment can honestly do:

- **Container/header decode is REAL**: `parse_media_header` reads
  width/height/media-type straight from payload bytes for PNG (IHDR,
  big-endian), JPEG (SOF marker walk, big-endian) and GIF (logical
  screen descriptor, little-endian) — pure stdlib `struct`, no codec
  libraries. This is the part of media decode a metadata/filtering
  pipeline needs (resolution filters, aspect-ratio buckets, format
  census) and it runs at full Arrow-batch speed.
- **Pixel/sample decode stays a stub**: inflating IDAT / entropy-
  decoding JPEG needs real codec libs; `decode_pixels` raises
  NotImplementedError documenting the PIL/av/librosa integration
  point, and `byte_stat_features` provides the deterministic stand-in
  feature vector so downstream plumbing (array<double> features into
  ANN / dedup) is exercised end to end.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metadata struct carried next to every binary payload.
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_bytes long, "
    "feature array<double>"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG start-of-frame markers that carry dimensions (all SOFn except
#: DHT/JPG/DAC which reuse the 0xC4/0xC8/0xCC slots).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_header(payload: bytes | None) -> tuple[str, int | None, int | None]:
    """(media_type, width, height) parsed from real container bytes.

    Spec offsets, not heuristics: PNG IHDR width/height are the two
    big-endian uint32s at bytes 16..23 (signature 8 + chunk len 4 +
    'IHDR' 4); JPEG dimensions live in the first SOFn segment (height
    then width, big-endian uint16s at segment offsets 5/7); GIF width/
    height are little-endian uint16s at bytes 6..9 of the logical
    screen descriptor. Unknown/truncated payloads → ('unknown', None,
    None) rather than raising: at 100 TB a malformed blob must not
    kill the stage.
    """
    if not payload:
        return ("unknown", None, None)
    if payload[:8] == _PNG_SIG and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return ("image/png", w, h)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments
        i = 2
        while i + 2 <= len(payload):
            if payload[i] != 0xFF:
                break
            # 0xFF fill bytes may pad between segments (B.1.1.2): skip
            # to the last 0xFF, which prefixes the real marker byte.
            while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 2 > len(payload):
                break
            marker = payload[i + 1]
            if marker in (0xDA, 0xD9):
                # SOS: entropy-coded data follows (no framed segments —
                # bytes there would be misread as headers); EOI: end of
                # image. Either way no SOF can legally follow.
                break
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                # SOI / TEM / RSTn: standalone markers, no length field
                i += 2
                continue
            if i + 4 > len(payload):
                break
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if seg_len < 2:  # malformed length would loop forever
                break
            if marker in _JPEG_SOF and i + 9 <= len(payload):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("image/jpeg", w, h)
            i += 2 + seg_len
        return ("image/jpeg", None, None)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("image/gif", w, h)
    return ("unknown", None, None)


def synth_media(doc_id: int, n_filler: int = 0) -> bytes:
    """Deterministic synthetic media payload for doc_id: a VALID
    minimal PNG / JPEG / GIF container (format = doc_id mod 3) whose
    dimensions are arithmetic in doc_id — so an SQL oracle can predict
    exactly what the real header parser must recover from the bytes.

    width = 16 + doc_id mod 97, height = 16 + 7·doc_id mod 89.
    """
    w = 16 + doc_id % 97
    h = 16 + (7 * doc_id) % 89
    fmt = doc_id % 3
    filler = bytes((doc_id + i) % 251 for i in range(n_filler))
    if fmt == 0:  # PNG: signature + IHDR chunk with correct CRC
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = b"IHDR" + ihdr
        crc = struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        return _PNG_SIG + struct.pack(">I", len(ihdr)) + chunk + crc + filler
    if fmt == 1:  # JPEG: SOI + APP0 stub + SOF0 (1 component) + EOI
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 11)  # len: 2 + precision 1 + dims 4 + nc 1 + comp 3
            + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x01"
            + b"\x01\x11\x00"
        )
        return b"\xff\xd8" + app0 + sof0 + filler + b"\xff\xd9"
    # GIF89a logical screen descriptor (little-endian dims)
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + filler + b"\x3b"


def byte_stat_features(payload: bytes | None, dims: int = 4) -> list[float]:
    """Deterministic byte-statistics feature vector — the stand-in for
    pixel decode (stable across runs/machines; exercises array<double>
    feature plumbing into ANN/dedup)."""
    if payload is None or len(payload) == 0:
        return [0.0] * dims
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 997),
    ][:dims]


def decode_pixels(payload: bytes) -> list[float]:
    """Pixel/sample decode — NOT available in this environment.

    Integration point: swap in PIL/av/librosa here; the Spark plumbing
    (mapInPandas batching below) is unchanged by the codec choice.
    Header/dimension decode does NOT go through this — that's
    `parse_media_header`, which is real.
    """
    raise NotImplementedError(
        "pixel codecs are not installed in this environment; "
        "use byte_stat_features (deterministic) or install a codec"
    )


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


def pack_synthetic_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic synthetic media payload per row (see
    synth_media) — the test-bench source for the real header parser.
    Arrow-batched; at scale this stage is where a real ingest would
    read object-store bytes instead."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [synth_media(int(i), n_filler=int(i) % 32) for i in ids],
                }
            )

    return df.select(F.col(id_col)).mapInPandas(batches, schema="doc_id long, payload binary")


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched media decode over binary payloads: REAL header
    parsing (media_type/width/height from bytes) + byte-stat features.

    mapInPandas: each worker receives pandas batches of (doc_id,
    payload[, ...]) — the right shape for feeding a native decoder
    without per-row Python overhead. `real_decode=True` routes
    features through `decode_pixels` (raises until codecs exist).
    """
    feat = decode_pixels if real_decode else byte_stat_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            headers = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [t for t, _, _ in headers],
                    "width": pd.array([w for _, w, _ in headers], dtype="Int32"),
                    "height": pd.array([h for _, _, h in headers], dtype="Int32"),
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [feat(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
