"""Multimodal binary-column tests (SURVEY.md §2-J): REAL header
decode pinned to golden real-world bytes, synthetic-container
round-trip, Arrow batch shape through mapInPandas, deterministic
byte-stat features, and the documented NotImplementedError on the
pixel-codec path.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocean_data_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    byte_stat_features,
    decode_pixels,
    extract_features,
    pack_binary,
    pack_synthetic_media,
    parse_media_header,
    synth_media,
)

# Golden bytes from the wild — NOT produced by synth_media — so the
# parser is pinned to the file-format specs, not to our own writer.
# 1x1 transparent PNG (the canonical data-URI example).
GOLDEN_PNG_1X1 = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000100000001"
    "08060000001f15c4890000000a49444154789c6300010000"
    "0500010d0a2db40000000049454e44ae426082"
)
# Minimal JPEG: SOI + SOF0 (8-bit, 2 high x 3 wide, 1 component) + EOI.
GOLDEN_JPEG_2X3 = bytes.fromhex("ffd8ffc0000b08000200030101110000ffd9")
# GIF89a header for a 7x5 image (little-endian dims).
GOLDEN_GIF_7X5 = b"GIF89a" + bytes([7, 0, 5, 0]) + b"\x00\x00\x00\x3b"


def test_parse_golden_headers():
    assert parse_media_header(GOLDEN_PNG_1X1) == ("image/png", 1, 1)
    assert parse_media_header(GOLDEN_JPEG_2X3) == ("image/jpeg", 3, 2)
    assert parse_media_header(GOLDEN_GIF_7X5) == ("image/gif", 7, 5)


def test_parse_malformed_is_total():
    assert parse_media_header(None) == ("unknown", None, None)
    assert parse_media_header(b"") == ("unknown", None, None)
    assert parse_media_header(b"\x89PNG")[0] == "unknown"  # truncated sig
    assert parse_media_header(b"not an image at all") == ("unknown", None, None)
    # JPEG SOI but no SOF segment before truncation
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00\x04ab") == ("image/jpeg", None, None)


def test_jpeg_marker_walk_real_world_structure():
    """Padded/progressive real-world JPEGs: 0xFF fill bytes between
    segments, TEM and RSTn standalone markers, and entropy-coded data
    after SOS that must never be misread as segment headers."""
    sof0 = b"\xff\xc0" + bytes([0, 11, 8, 0, 2, 0, 3, 1, 1, 17, 0])
    # fill bytes + TEM before SOF: still parsed
    padded = b"\xff\xd8" + b"\xff\xff\xff\x01" + sof0 + b"\xff\xd9"
    assert parse_media_header(padded) == ("image/jpeg", 3, 2)
    # SOS terminates the walk: entropy bytes contain a fake "SOF" that
    # would decode as garbage dimensions if the walk kept going
    fake_sof_in_scan = b"\xff\xc0\x00\x0b\x08\xff\xff\xff\xff\x01\x01\x11\x00"
    sos = b"\xff\xda" + bytes([0, 8, 1, 1, 0, 0, 63, 0])
    scan_first = b"\xff\xd8" + sos + fake_sof_in_scan + b"\xff\xd9"
    assert parse_media_header(scan_first) == ("image/jpeg", None, None)
    # EOI terminates the walk
    assert parse_media_header(b"\xff\xd8\xff\xd9" + sof0) == ("image/jpeg", None, None)
    # zero segment length (malformed) terminates instead of looping
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00\x00" * 3) == (
        "image/jpeg", None, None,
    )
    # RSTn standalone markers are stepped over
    rst = b"\xff\xd8" + b"\xff\xd0\xff\xd7" + sof0 + b"\xff\xd9"
    assert parse_media_header(rst) == ("image/jpeg", 3, 2)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 96, 97, 255, 10_000])
def test_synth_media_roundtrip(doc_id):
    payload = synth_media(doc_id, n_filler=doc_id % 32)
    media_type, w, h = parse_media_header(payload)
    expected_type = ("image/png", "image/jpeg", "image/gif")[doc_id % 3]
    assert media_type == expected_type
    assert w == 16 + doc_id % 97
    assert h == 16 + (7 * doc_id) % 89
    base = {0: 33, 1: 35, 2: 14}[doc_id % 3]
    assert len(payload) == base + doc_id % 32


def test_extract_features_real_headers(spark):
    docs = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    out = extract_features(pack_synthetic_media(docs))
    assert (
        out.schema.simpleString()
        == spark.createDataFrame([], FEATURE_SCHEMA).schema.simpleString()
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["media_type"] == "image/png"
    assert (rows[0]["width"], rows[0]["height"]) == (16, 16)
    assert rows[1]["media_type"] == "image/jpeg"
    assert rows[2]["media_type"] == "image/gif"


def test_extract_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "binary payload stand-in")],
        "doc_id long, text string",
    )
    media_df = pack_binary(docs, "text").select("doc_id", "payload")
    out = extract_features(media_df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert rows[1]["feature"] == byte_stat_features(b"hello world")
    assert rows[1]["media_type"] == "unknown" and rows[1]["width"] is None
    assert rows[2]["n_bytes"] == 0 and rows[2]["feature"] == [0.0] * 4
    # run twice -> identical (byte stats are deterministic)
    assert {r["doc_id"]: r["feature"] for r in extract_features(media_df).collect()} == {
        k: r["feature"] for k, r in rows.items()
    }


def test_pixel_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_pixels(GOLDEN_PNG_1X1)


# --- audio/video header parsing ---------------------------------------


def test_wav_parser_recovers_fields():
    import struct

    from ocean_data_pipeline_spark.operators.multimodal import parse_av_header

    # hand-built WAV: 3 channels, 22050 Hz, 8-bit, 5 samples
    fmt = struct.pack("<HHIIHH", 1, 3, 22050, 22050 * 3, 3, 8)
    data = b"\x01" * 15
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_av_header(wav) == ("audio/wav", 22050, 3, 8, 5, 0)


def test_wav_parser_honors_odd_chunk_padding():
    import struct

    from ocean_data_pipeline_spark.operators.multimodal import parse_av_header

    # an odd-sized junk chunk BEFORE fmt must be skipped with its pad
    # byte; a parser that forgets the pad misaligns every later chunk
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 + pad
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 16)
    data = b"\x00" * 8  # 4 samples
    body = b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_av_header(wav) == ("audio/wav", 8000, 1, 16, 4, 0)


def test_mp4_parser_reads_mvhd_duration():
    import struct

    from ocean_data_pipeline_spark.operators.multimodal import parse_av_header

    ftyp = struct.pack(">I", 16) + b"ftypisom\x00\x00\x02\x00"
    mvhd_body = b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
    mvhd_body += struct.pack(">II", 600, 1500) + b"\x00" * 80  # 2.5 s
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    assert parse_av_header(ftyp + moov) == (
        "video/mp4", None, None, None, None, 2500,
    )


def test_av_parser_survives_malformed_payloads():
    from ocean_data_pipeline_spark.operators.multimodal import (
        parse_av_header,
        synth_av_media,
    )

    assert parse_av_header(None)[0] == "unknown"
    assert parse_av_header(b"")[0] == "unknown"
    assert parse_av_header(b"RIFF\xff\xff\xff\xffWAVE")[0] == "audio/wav"
    assert parse_av_header(b"\x00" * 64)[0] == "unknown"
    # truncating a valid container anywhere must never raise
    full = synth_av_media(4)
    for cut in range(0, len(full), 7):
        parse_av_header(full[:cut])
    full = synth_av_media(5)
    for cut in range(0, len(full), 7):
        parse_av_header(full[:cut])


def test_synth_av_roundtrip_matches_arithmetic():
    from ocean_data_pipeline_spark.operators.multimodal import (
        parse_av_header,
        synth_av_media,
    )

    for doc_id in range(0, 200, 7):
        got = parse_av_header(synth_av_media(doc_id))
        if doc_id % 2 == 0:
            sr = 8000 + 100 * (doc_id % 80)
            n = 32 + doc_id % 64
            assert got == (
                "audio/wav", sr, 1 + ((doc_id // 2) % 2), 16, n, n * 1000 // sr,
            )
        else:
            assert got == (
                "video/mp4", None, None, None, None, 250 * (1 + doc_id % 40),
            )


# --- fuzz: parsers must be total on arbitrary bytes -------------------


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_media_header_parser_total_on_fuzz(payload):
    from ocean_data_pipeline_spark.operators.multimodal import parse_media_header

    t, w, h = parse_media_header(payload)
    assert isinstance(t, str)
    assert w is None or w >= 0
    assert h is None or h >= 0


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_av_header_parser_total_on_fuzz(payload):
    from ocean_data_pipeline_spark.operators.multimodal import parse_av_header

    t, sr, ch, bits, n, dur = parse_av_header(payload)
    assert isinstance(t, str)


@given(st.integers(min_value=0, max_value=10_000), st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_valid_container_with_corrupt_tail_keeps_header_fields(doc_id, tail):
    """Appending garbage AFTER a valid container must not change the
    parsed header fields (parsers read spec offsets, not file ends) —
    except WAV, where extra bytes can legitimately parse as additional
    RIFF chunks; there the parse must merely stay total and keep the
    media type."""
    from ocean_data_pipeline_spark.operators.multimodal import (
        parse_av_header,
        parse_media_header,
        synth_av_media,
        synth_media,
    )

    img = synth_media(doc_id)
    assert parse_media_header(img + tail)[:3] == parse_media_header(img)[:3]
    av = synth_av_media(doc_id)
    got = parse_av_header(av + tail)
    if doc_id % 2 == 0:
        assert got[0] == "audio/wav"
    else:
        # MP4: garbage after the moov box is skipped by the box walk
        assert got == parse_av_header(av)
