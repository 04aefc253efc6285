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

import numpy as np
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


# --- audio / video container headers ----------------------------------

AV_META_SCHEMA = (
    "doc_id long, media_type string, sample_rate int, channels int, "
    "bit_depth int, n_samples long, duration_ms long"
)


def parse_av_header(
    payload: bytes | None,
) -> tuple[str, int | None, int | None, int | None, int | None, int | None]:
    """(media_type, sample_rate, channels, bit_depth, n_samples,
    duration_ms) from real container bytes — the audio/video sibling of
    `parse_media_header`, pure stdlib `struct`:

    - WAV: RIFF chunk walk (ids ASCII, sizes little-endian uint32, odd
      sizes pad to even per spec); 'fmt ' carries channels @2, sample
      rate @4, bits-per-sample @14; 'data' carries the payload size,
      so n_samples = data_size / block_align and duration follows.
    - MP4: ISO-BMFF box walk (sizes big-endian uint32); an 'ftyp'
      leading box marks the container, 'moov'→'mvhd' (version-0)
      carries timescale @12 and duration @16 of the box body, so
      duration_ms = 1000·duration/timescale.

    Truncated/malformed payloads → ('unknown', None, ...) — a bad blob
    must not kill the stage.
    """
    none = (None, None, None, None, None)
    if not payload or len(payload) < 12:
        return ("unknown", *none)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        sr = ch = bits = block_align = None
        data_size = None
        i = 12
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            (csize,) = struct.unpack("<I", payload[i + 4 : i + 8])
            body = payload[i + 8 : i + 8 + csize]
            if cid == b"fmt " and len(body) >= 16:
                ch, sr = struct.unpack("<HI", body[2:8])
                block_align, bits = struct.unpack("<HH", body[12:16])
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)  # odd chunk sizes pad to even
        n_samples = (
            data_size // block_align if data_size is not None and block_align else None
        )
        dur = (
            int(n_samples * 1000 // sr) if n_samples is not None and sr else None
        )
        return ("audio/wav", sr, ch, bits, n_samples, dur)
    if payload[4:8] == b"ftyp":
        i = 0
        while i + 8 <= len(payload):
            (bsize,) = struct.unpack(">I", payload[i : i + 4])
            btype = payload[i + 4 : i + 8]
            if bsize < 8:
                break
            if btype == b"moov":
                j = i + 8
                end = min(i + bsize, len(payload))
                while j + 8 <= end:
                    (csize,) = struct.unpack(">I", payload[j : j + 4])
                    ctype = payload[j + 4 : j + 8]
                    if csize < 8:
                        break
                    if ctype == b"mvhd" and j + 28 <= len(payload):
                        version = payload[j + 8]
                        if version == 0:
                            ts, dur = struct.unpack(">II", payload[j + 20 : j + 28])
                            ms = int(dur * 1000 // ts) if ts else None
                            return ("video/mp4", None, None, None, None, ms)
                    j += csize
            i += bsize
        return ("video/mp4", *none)
    return ("unknown", *none)


def synth_av_media(doc_id: int) -> bytes:
    """Deterministic synthetic audio/video payload: a VALID minimal WAV
    (even doc_id) or MP4 ftyp+moov/mvhd (odd doc_id) whose parameters
    are arithmetic in doc_id, so an SQL oracle predicts exactly what
    the parser must recover:

    WAV: sample_rate = 8000 + 100·(doc_id mod 80), channels =
    1 + (doc_id mod 2 of doc_id//2), bits = 16, n_samples =
    32 + doc_id mod 64. MP4: timescale 1000, duration =
    250·(1 + doc_id mod 40) ms.
    """
    if doc_id % 2 == 0:
        sr = 8000 + 100 * (doc_id % 80)
        ch = 1 + ((doc_id // 2) % 2)
        bits = 16
        n_samples = 32 + doc_id % 64
        block = ch * bits // 8
        data = bytes((doc_id + k) % 251 for k in range(n_samples * block))
        fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * block, block, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(data)) + data
        riff_body = b"WAVE" + chunks
        return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    ftyp = b"isom\x00\x00\x02\x00isommp41"
    ftyp_box = struct.pack(">I", 8 + len(ftyp)) + b"ftyp" + ftyp
    dur_ms = 250 * (1 + doc_id % 40)
    mvhd_body = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", 1000, dur_ms)  # timescale, duration
        + b"\x00" * 80  # rate/volume/matrix/predefines/next-track
    )
    mvhd_box = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov_box = struct.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    return ftyp_box + moov_box


def pack_synthetic_av(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic synthetic WAV/MP4 payload per row —
    the audio/video test-bench twin of `pack_synthetic_media`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [synth_av_media(int(i)) for i in ids],
                }
            )

    return df.select(F.col(id_col)).mapInPandas(batches, schema="doc_id long, payload binary")


def extract_av_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched audio/video header decode over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_av_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [t for t, *_ in parsed],
                    "sample_rate": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "channels": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "bit_depth": pd.array([p[3] for p in parsed], dtype="Int32"),
                    "n_samples": pd.array([p[4] for p in parsed], dtype="Int64"),
                    "duration_ms": pd.array([p[5] for p in parsed], dtype="Int64"),
                }
            )

    return df.mapInPandas(batches, schema=AV_META_SCHEMA)


# --- raw (codec-free) video/image: frame sampling + resize ------------

#: Raw container magics: uncompressed byte-planes, so frame sampling
#: and resizing are REAL transformations here (no codec gate needed) —
#: the processing path a pipeline runs after upstream decode, with the
#: decode itself staying codec-gated (decode_pixels).
_RAWV_MAGIC = b"RAWV"
_RAWI_MAGIC = b"RAWI"


def synth_raw_video(doc_id: int) -> bytes:
    """Deterministic uncompressed video: RAWV + uint16 (W, H, n_frames)
    little-endian, then n_frames planes of W*H bytes where frame f
    byte k = (doc_id*7 + f*13 + k*29) % 251 — every sampled frame's
    checksum is pure arithmetic an SQL oracle reproduces."""
    w = 6 + doc_id % 5
    h = 4 + doc_id % 3
    n_frames = 4 + doc_id % 8
    header = _RAWV_MAGIC + struct.pack("<HHH", w, h, n_frames)
    frames = bytes(
        (doc_id * 7 + f * 13 + k * 29) % 251
        for f in range(n_frames)
        for k in range(w * h)
    )
    return header + frames


def synth_raw_image(doc_id: int) -> bytes:
    """Deterministic uncompressed grayscale image: RAWI + uint16 (W, H)
    little-endian, then W*H bytes with pixel(y, x) =
    (doc_id*11 + y*17 + x*5) % 251."""
    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    header = _RAWI_MAGIC + struct.pack("<HH", w, h)
    pixels = bytes(
        (doc_id * 11 + y * 17 + x * 5) % 251 for y in range(h) for x in range(w)
    )
    return header + pixels


def sample_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """Every `stride`-th frame from RAWV payloads via Arrow-batched
    mapInPandas: emits (doc_id, frame_idx, width, height, frame_sum,
    first_byte) — the frame-level fan-out a video pipeline feeds to
    per-frame feature extractors. Output is one row per SAMPLED frame,
    so downstream operators see frames as first-class rows (explode
    posture); malformed payloads contribute zero rows rather than
    failing the stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "width": [],
                "height": [], "frame_sum": [], "first_byte": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or payload[:4] != _RAWV_MAGIC or len(payload) < 10:
                    continue
                w, h, n_frames = struct.unpack("<HHH", payload[4:10])
                fsize = w * h
                for f in range(0, n_frames, stride):
                    frame = payload[10 + f * fsize : 10 + (f + 1) * fsize]
                    if len(frame) < fsize:
                        break
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["frame_sum"].append(sum(frame))
                    out["first_byte"].append(frame[0])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        schema="doc_id long, frame_idx int, width int, height int, "
        "frame_sum long, first_byte int",
    )


def resize_nearest(df: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Nearest-neighbor resize of RAWI payloads to out_w×out_h via
    mapInPandas: thumbnail pixel (py, px) = source pixel
    (floor(py*H/out_h), floor(px*W/out_w)) — the real downsample
    arithmetic every thumbnail/embedding-prep stage runs, emitted as
    one row per output pixel so the oracle can pin every byte."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "py": [], "px": [], "pixel": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or payload[:4] != _RAWI_MAGIC or len(payload) < 8:
                    continue
                w, h = struct.unpack("<HH", payload[4:8])
                pixels = payload[8 : 8 + w * h]
                if len(pixels) < w * h:
                    continue
                for py in range(out_h):
                    sy = py * h // out_h
                    for px in range(out_w):
                        sx = px * w // out_w
                        out["doc_id"].append(int(doc_id))
                        out["py"].append(py)
                        out["px"].append(px)
                        out["pixel"].append(pixels[sy * w + sx])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches, schema="doc_id long, py int, px int, pixel int"
    )


def pack_synthetic_raw(df: DataFrame, kind: str, id_col: str = "doc_id") -> DataFrame:
    """Attach synth_raw_video / synth_raw_image payloads per row."""
    maker = {
        "video": synth_raw_video,
        "image": synth_raw_image,
        "audio": synth_raw_audio,
    }[kind]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [maker(int(i)) for i in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


# --- raw audio --------------------------------------------------------

_RAWA_MAGIC = b"RAWA"


def synth_raw_audio(doc_id: int) -> bytes:
    """Deterministic uncompressed audio: RAWA + uint32 n_samples
    little-endian, then n_samples unsigned-byte samples with
    s[k] = (doc_id*3 + k*31) % 251 — every energy statistic is pure
    arithmetic an SQL oracle reproduces."""
    n = 256 + (doc_id % 7) * 64
    header = _RAWA_MAGIC + struct.pack("<I", n)
    samples = bytes((doc_id * 3 + k * 31) % 251 for k in range(n))
    return header + samples


def audio_energy(df: DataFrame) -> DataFrame:
    """Per-payload PCM energy statistics via Arrow-batched mapInPandas:
    (doc_id, n_samples, sum_s, sum_s2, peak) — the UDF emits ONLY
    integer sums (numpy int64 over the sample bytes), so every derived
    statistic (mean level, RMS) is a fixed engine-side chain and the
    Python stage has no float behavior to pin. Malformed payloads
    contribute zero rows (same fault isolation as sample_frames)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "n_samples": [], "sum_s": [], "sum_s2": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    if raw[:4] != _RAWA_MAGIC:
                        continue
                    (n,) = struct.unpack("<I", raw[4:8])
                    body = raw[8 : 8 + n]
                    if len(body) != n:
                        continue
                    s = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
                    out["doc_id"].append(int(doc_id))
                    out["n_samples"].append(int(n))
                    out["sum_s"].append(int(s.sum()))
                    out["sum_s2"].append(int((s * s).sum()))
                    out["peak"].append(int(s.max()) if n else 0)
                except Exception:  # noqa: BLE001 — malformed payload
                    continue
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        schema="doc_id long, n_samples int, sum_s long, sum_s2 long, peak int",
    )
