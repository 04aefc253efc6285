"""Property-based converter tests (SURVEY.md §5: the reference checks
round-trips on hand-picked samples, tests/test_dynamic_api.py:26-75;
hypothesis generalizes to the whole domain with a fixed seed).

Properties run through the REAL column expressions (one batched Spark
job per property, not per example — hypothesis drives the input list).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocean_data_pipeline_spark.functions import grid as g
from ocean_data_pipeline_spark.functions.timeidx import date_to_month_index, month_index_to_date

import pyspark.sql.functions as F

GRID = g.DEFAULT_GRID
_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


def _eval(spark, values, build):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    return [r["y"] for r in df.select(build(F.col("x")).alias("y")).collect()]


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=10.0, max_value=55.0, allow_nan=False), min_size=1, max_size=50))
def test_lat_snap_idempotent(spark, lats):
    """snap(snap(x)) == snap(x): snapping is a projection onto grid
    centers, and centers are fixed points."""
    snapped = _eval(spark, lats, lambda c: g.snap_lat(c))
    twice = _eval(spark, snapped, lambda c: g.snap_lat(c))
    assert snapped == twice
    # within the representable axis span [anchor − (cells−1)·res, anchor]
    # a snap moves at most half a cell; below it, inputs clamp to the
    # southern edge (the reference's own geometry: clamp range 10..55
    # but 91 cells only reach 32.5, config.py:24-47 vs :83).
    edge = GRID.lat_anchor - (GRID.lat_cells - 1) * GRID.resolution
    for s, x in zip(snapped, lats):
        if x >= edge:
            assert abs(s - x) <= GRID.resolution / 2 + 1e-9
        else:
            assert s == edge


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=50))
def test_lat_index_roundtrip(spark, idxs):
    """index → coordinate → index is the identity on the full axis."""
    df = spark.createDataFrame([(i,) for i in idxs], "i int")
    back = [
        r["j"]
        for r in df.select(
            g.lat_to_index(g.index_to_lat(F.col("i"))).alias("j")
        ).collect()
    ]
    assert back == idxs


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=50))
def test_lon_index_roundtrip(spark, idxs):
    df = spark.createDataFrame([(i,) for i in idxs], "i int")
    back = [
        r["j"]
        for r in df.select(
            g.lon_to_index(g.index_to_lon(F.col("i"))).alias("j")
        ).collect()
    ]
    assert back == idxs


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1955, max_value=1960), st.integers(min_value=1, max_value=12)),
        min_size=1,
        max_size=50,
    )
)
def test_month_index_roundtrip(spark, ym):
    """date → month index → first-of-month date is the identity for
    in-range dates (reference round-trip, tests/test_dynamic_api.py:54-75)."""
    dates = [f"{y:04d}-{m:02d}-01" for y, m in ym]
    df = spark.createDataFrame([(d,) for d in dates], "d string")
    out = df.select(
        month_index_to_date(
            date_to_month_index(F.to_date("d"), epoch_year=1955, n_months=72),
            epoch_year=1955,
        ).alias("back")
    ).collect()
    assert [str(r["back"]) for r in out] == dates


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=-200, max_value=200, allow_nan=False), min_size=1, max_size=50))
def test_out_of_bbox_clamps_into_grid(spark, lats):
    """Any real input produces a valid in-grid index (clamp semantics,
    reference config.py:83-87) — no input can index outside the array."""
    df = spark.createDataFrame([(v,) for v in lats], "x double")
    idxs = [r["i"] for r in df.select(g.lat_to_index(F.col("x")).alias("i")).collect()]
    assert all(0 <= i <= 90 for i in idxs)


# --- as-of join vs pandas merge_asof (reference implementation) -------

_TS = st.integers(min_value=0, max_value=1_000)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.lists(_TS, min_size=1, max_size=12, unique=True),
    st.lists(_TS, min_size=1, max_size=12, unique=True),
    st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_join_matches_pandas_merge_asof(spark, lts, rts, direction):
    """For every direction, the union+window as-of plan must agree with
    pandas merge_asof on random integer timelines (single group)."""
    import pandas as pd

    from ocean_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([("g", t) for t in lts], "g string, t long")
    right = spark.createDataFrame(
        [("g", t, f"v{t}") for t in rts], "g string, rt long, v string"
    )
    got = {
        r["t"]: r["v"]
        for r in asof_join(left, right, "t", "rt", by=["g"], direction=direction).collect()
    }

    lp = pd.DataFrame({"t": sorted(lts)})
    rp = pd.DataFrame({"rt": sorted(rts), "v": [f"v{t}" for t in sorted(rts)]})
    want_df = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", direction=direction
    )
    want = {
        int(r.t): (None if pd.isna(r.v) else r.v) for r in want_df.itertuples()
    }
    assert got == want


# --- normalize_text ---------------------------------------------------

_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.lists(_TEXT, min_size=1, max_size=30))
def test_normalize_text_idempotent_and_variant_stable(spark, texts):
    """normalize(normalize(x)) == normalize(x), and case/extra-space
    variants of the same text normalize identically (the property the
    normalized-dedup census relies on)."""
    from ocean_data_pipeline_spark.operators.text import normalize_text

    def run(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x string")
        return [r["y"] for r in df.select(normalize_text(F.col("x")).alias("y")).collect()]

    once = run(texts)
    assert run(once) == once  # idempotent
    variants = [f"  {t.upper()}  " for t in texts]
    assert run(variants) == once  # trivially-variant copies collapse
