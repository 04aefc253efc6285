"""The packed-BIGINT wedge device in `_oriented_triangles` requires
node ids < 2^32 (TPC-H partkey crosses that at SF~21500). The guard
must route big-id graphs onto the struct-keyed close and produce the
identical triangle relation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.queries.graph_ops import _oriented_triangles

# K5 minus one edge (1-5 removed): triangles = C(5,3)=10 minus the 3
# triangles through the removed edge = 7.
_SMALL_EDGES = [
    (a, b)
    for a in range(1, 6)
    for b in range(a + 1, 6)
    if not (a == 1 and b == 5)
]


def _tri_set(spark, edges_rows):
    edges = spark.createDataFrame(edges_rows, "pa long, pb long")
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint()
    )
    tri = _oriented_triangles(spark, edges, deg)
    return {
        tuple(sorted((r.a, r.b, r.c))) for r in tri.collect()
    }, tri.count()


def test_packed_and_struct_paths_agree(spark):
    small, n_small = _tri_set(spark, _SMALL_EDGES)
    assert n_small == 7
    shift = 1 << 33  # push every id beyond the 32-bit pack bound
    big_rows = [(a + shift, b + shift) for a, b in _SMALL_EDGES]
    big, n_big = _tri_set(spark, big_rows)
    assert n_big == 7
    assert {
        tuple(x - shift for x in t) for t in big
    } == small


def test_packed_path_sign_band(spark):
    """Ids in [2^31, 2^32) pass the packed-path guard but land the high
    half's top bit in the long's sign bit; the decode must use a
    logical shift or b comes back as b - 2^32 (ADVICE r09)."""
    small, _ = _tri_set(spark, _SMALL_EDGES)
    shift = 1 << 31  # inside the packed path, top bit of the high half set
    band_rows = [(a + shift, b + shift) for a, b in _SMALL_EDGES]
    band, n_band = _tri_set(spark, band_rows)
    assert n_band == 7
    assert all(x > 0 for t in band for x in t)  # no sign-extended decode
    assert {tuple(x - shift for x in t) for t in band} == small


def test_wedge_pair_census_bands(spark):
    """The shared link-prediction census helper must produce identical
    (a, c, count) relations on the packed path (small ids and the
    [2^31, 2^32) sign band) and the struct fallback (ids >= 2^32)."""
    from ocean_data_pipeline_spark.queries.wave27_ops import _wedge_pair_census

    def census_set(shift):
        edges = spark.createDataFrame(
            [(a + shift, b + shift) for a, b in _SMALL_EDGES],
            "pa long, pb long",
        )
        sym = edges.selectExpr("pa AS src", "pb AS dst").unionAll(
            edges.selectExpr("pb AS src", "pa AS dst")
        )
        adj = sym.groupBy(F.col("src").alias("w")).agg(
            F.sort_array(F.collect_list("dst")).alias("ids")
        )
        out = _wedge_pair_census(spark, adj, F.col("ids"), "cnt")
        return {(r.a - shift, r.c - shift, r.cnt) for r in out.collect()}

    base = census_set(0)
    assert base  # K5-minus-an-edge has wedges
    assert census_set(1 << 31) == base  # packed path, sign band
    assert census_set(1 << 33) == base  # struct fallback
