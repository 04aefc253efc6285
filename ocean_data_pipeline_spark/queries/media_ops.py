"""Raw-media processing queries: frame sampling and resize (§2-J
multimodal width beyond header decode).

The payloads are deterministic UNCOMPRESSED containers
(operators/multimodal.py synth_raw_video/synth_raw_image), so the
frame-sample and nearest-neighbor-resize transformations are REAL —
no codec gate — and every output byte is arithmetic in (doc_id, index)
that the DuckDB oracle recomputes from generate_series. What's under
test is therefore the full Spark-side media plumbing: binary payload
packing, Arrow mapInPandas batch shape, frame fan-out (one row per
sampled frame / output pixel), and malformed-payload tolerance.

Scale posture: media rows fan out inside mapInPandas on whatever
partitioning the payload table has — no shuffle is introduced by the
sampling itself; per-task memory is bounded by Arrow batch size ×
frame size, the knob a 100 TB video pipeline tunes
(spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.multimodal import (
    pack_synthetic_raw,
    resize_nearest,
    sample_frames,
)
from ocean_data_pipeline_spark.queries import register

# Every 2nd frame of each doc's raw video; frame checksum/first-byte
# predicted per frame from the generator formula. W*H <= 10*6 = 60, so
# the oracle's per-frame byte series is generate_series(0, 59) filtered
# to k < W*H.
_FRAME_ORACLE = """
WITH vids AS (
  SELECT doc_id,
         6 + doc_id % 5 AS w,
         4 + doc_id % 3 AS h,
         4 + doc_id % 8 AS n_frames
  FROM documents WHERE doc_id % 13 = 0
),
frames AS (
  SELECT v.doc_id, v.w, v.h, f.f AS frame_idx
  FROM vids v
  JOIN (SELECT unnest(generate_series(0, 10)) AS f) f
    ON f.f < v.n_frames AND f.f % 2 = 0
),
bytes AS (
  SELECT fr.doc_id, fr.frame_idx, fr.w, fr.h,
         (fr.doc_id * 7 + fr.frame_idx * 13 + k.k * 29) % 251 AS b, k.k
  FROM frames fr
  JOIN (SELECT unnest(generate_series(0, 59)) AS k) k
    ON k.k < fr.w * fr.h
)
SELECT doc_id, frame_idx,
       CAST(min(w) AS INT) AS width, CAST(min(h) AS INT) AS height,
       CAST(sum(b) AS BIGINT) AS frame_sum,
       CAST(min(CASE WHEN k = 0 THEN b END) AS INT) AS first_byte
FROM bytes
GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
"""


@register("video_frame_sample", oracle=_FRAME_ORACLE)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-2 frame sampling over raw video payloads through Arrow
    mapInPandas — one output row per sampled frame with its checksum;
    the oracle rebuilds every frame byte from the generator arithmetic,
    so the sampler's offsets/stride/shape are value-gated."""
    ids = table(spark, sf_dir, "documents", spread=True).where(
        F.col("doc_id") % 13 == 0
    )
    packed = pack_synthetic_raw(ids, kind="video")
    return sample_frames(packed, stride=2).orderBy("doc_id", "frame_idx")


# 4x4 nearest-neighbor thumbnails; every output pixel is the source
# pixel at (floor(py*H/4), floor(px*W/4)) of the generator image.
_RESIZE_ORACLE = """
WITH imgs AS (
  SELECT doc_id,
         8 + doc_id % 9 AS w,
         8 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 17 = 0
),
grid AS (
  SELECT i.doc_id, i.w, i.h, py.py, px.px
  FROM imgs i
  JOIN (SELECT unnest(generate_series(0, 3)) AS py) py ON TRUE
  JOIN (SELECT unnest(generate_series(0, 3)) AS px) px ON TRUE
)
SELECT doc_id, CAST(py AS INT) AS py, CAST(px AS INT) AS px,
       CAST((doc_id * 11
             + CAST(floor(py * h / 4.0) AS BIGINT) * 17
             + CAST(floor(px * w / 4.0) AS BIGINT) * 5) % 251 AS INT) AS pixel
FROM grid
ORDER BY doc_id, py, px
"""


@register("image_resize_nn", oracle=_RESIZE_ORACLE)
def image_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 4×4 thumbnails of raw grayscale images via
    mapInPandas — one row per output pixel, each byte pinned by the
    oracle's closed-form source-pixel arithmetic (the resize every
    vision-embedding prep stage runs before the model)."""
    ids = table(spark, sf_dir, "documents", spread=True).where(
        F.col("doc_id") % 17 == 0
    )
    packed = pack_synthetic_raw(ids, kind="image")
    return resize_nearest(packed, out_w=4, out_h=4).orderBy("doc_id", "py", "px")


# Per-payload PCM energy; the oracle rebuilds every sample from the
# generator arithmetic s[k] = (doc_id*3 + k*31) % 251.
_AUDIO_ORACLE = """
WITH ids AS (
  SELECT doc_id, 256 + (doc_id % 7) * 64 AS n
  FROM documents WHERE doc_id % 11 = 0
),
samples AS (
  SELECT i.doc_id, i.n, k.k,
         (i.doc_id * 3 + k.k * 31) % 251 AS s
  FROM ids i
  JOIN LATERAL (SELECT unnest(generate_series(0, i.n - 1)) AS k) k ON TRUE
),
sums AS (
  SELECT doc_id, max(n) AS n, sum(s) AS sum_s, sum(s * s) AS sum_s2,
         max(s) AS peak
  FROM samples GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS INT) AS n_samples,
       CAST(peak AS INT) AS peak,
       CAST(sum_s AS DOUBLE) / n AS mean_level,
       sqrt(CAST(sum_s2 AS DOUBLE) / n) AS rms_level
FROM sums
ORDER BY doc_id
"""


@register("audio_energy_census", oracle=_AUDIO_ORACLE)
def audio_energy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM energy census over raw audio payloads through Arrow
    mapInPandas — the audio leg of the media-plumbing family
    (video_frame_sample / image_resize_nn's sibling): payload packing,
    RAWA header parse, numpy sample decode, and per-payload integer
    energy sums, with mean and RMS level derived ENGINE-SIDE from the
    UDF's integer outputs (the Python stage has no float behavior to
    pin). The oracle rebuilds every sample from the generator
    arithmetic, so header offsets and the decode path are value-gated.

    Plan shape: mapInPandas fan-IN (one row per payload, no shuffle
    introduced); the derived statistics are per-row expressions. At
    100 TB: the standard decode-and-reduce audio featurization pass,
    task memory bounded by Arrow batch size x payload size."""
    from ocean_data_pipeline_spark.operators.multimodal import (
        audio_energy,
        pack_synthetic_raw,
    )

    ids = table(spark, sf_dir, "documents", spread=True).where(
        F.col("doc_id") % 11 == 0
    )
    packed = pack_synthetic_raw(ids, kind="audio")
    e = audio_energy(packed)
    return e.select(
        "doc_id",
        "n_samples",
        "peak",
        (F.col("sum_s").cast("double") / F.col("n_samples")).alias("mean_level"),
        F.sqrt(F.col("sum_s2").cast("double") / F.col("n_samples")).alias(
            "rms_level"
        ),
    ).orderBy("doc_id")
