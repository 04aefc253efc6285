"""as-of join direction semantics (operators.joins.asof_join):
backward = latest right <= t, forward = earliest right >= t, both
INCLUSIVE at equal timestamps (pandas merge_asof contract), NULL when
nothing exists in the search direction.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.operators.joins import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 20), ("b", 7)],
        "g string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, "r10"), ("a", 15, "r15"), ("b", 1, "r1")],
        "g string, rt long, v string",
    )
    return left, right


def _collect(df):
    return {(r["g"], r["t"]): r["v"] for r in df.collect()}


def test_asof_backward(spark, frames):
    left, right = frames
    out = asof_join(left, right, "t", "rt", by=["g"], direction="backward")
    got = _collect(out)
    assert got[("a", 5)] is None          # nothing at or before 5
    assert got[("a", 10)] == "r10"        # inclusive at equal t
    assert got[("a", 20)] == "r15"        # latest of {10, 15}
    assert got[("b", 7)] == "r1"


def test_asof_forward(spark, frames):
    left, right = frames
    out = asof_join(left, right, "t", "rt", by=["g"], direction="forward")
    got = _collect(out)
    assert got[("a", 5)] == "r10"         # earliest of {10, 15}
    assert got[("a", 10)] == "r10"        # inclusive at equal t
    assert got[("a", 20)] is None         # nothing at or after 20
    assert got[("b", 7)] is None


def test_asof_bad_direction(frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "t", "rt", by=["g"], direction="sideways")


def test_asof_nearest(spark, frames):
    left, right = frames
    out = asof_join(left, right, "t", "rt", by=["g"], direction="nearest")
    got = _collect(out)
    assert got[("a", 5)] == "r10"         # only forward exists
    assert got[("a", 10)] == "r10"        # distance 0, backward tie-break
    assert got[("a", 20)] == "r15"        # only backward exists
    assert got[("b", 7)] == "r1"


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([("a", 10)], "g string, t long")
    right = spark.createDataFrame(
        [("a", 8, "back"), ("a", 12, "fwd")], "g string, rt long, v string"
    )
    out = asof_join(left, right, "t", "rt", by=["g"], direction="nearest")
    assert _collect(out)[("a", 10)] == "back"  # equidistant -> backward


def test_asof_bucketed_matches_naive(spark, frames):
    """bucket_width routes the fill through the distributed running-
    agg device; results must equal the naive window path row for row
    (unique right keys), for both supported directions, with and
    without by-keys, across widths that split / don't split the axis."""
    left, right = frames
    for direction in ("backward", "forward"):
        for width in (1.0, 4.0, 100.0):
            naive = _collect(
                asof_join(left, right, "t", "rt", by=["g"], direction=direction)
            )
            bucketed = _collect(
                asof_join(
                    left, right, "t", "rt", by=["g"],
                    direction=direction, bucket_width=width,
                )
            )
            assert bucketed == naive, (direction, width)
    # global axis (empty by): the row-scale case the mode exists for
    gl = left.drop("g").distinct()
    gr = right.drop("g").distinct()
    for direction in ("backward", "forward"):
        naive = {
            r["t"]: r["v"]
            for r in asof_join(gl, gr, "t", "rt", direction=direction).collect()
        }
        bucketed = {
            r["t"]: r["v"]
            for r in asof_join(
                gl, gr, "t", "rt", direction=direction, bucket_width=3.0
            ).collect()
        }
        assert bucketed == naive, direction


def test_asof_bucketed_nearest_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(
            left, right, "t", "rt", by=["g"],
            direction="nearest", bucket_width=1.0,
        )
