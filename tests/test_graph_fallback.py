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
