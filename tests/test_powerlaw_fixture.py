"""Pin the deterministic Chung-Lu power-law fixture that backs the
hub-cap recall row in PLANS.md (VERDICT r10 item 4).

The probe's conclusion — capped top-20 recall is 20/20 on the cap's
design-target topology — is only as durable as the fixture's shape, so
these tests pin (a) the exact edge census (the generator is a pure
function of its parameters; any drift in hashing or weights shows up
here first) and (b) the degree-tail facts the recall argument rests
on: the node mass sits under the cap while a small hub tail sits far
above it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.synthetic import powerlaw_edges
from ocean_data_pipeline_spark.queries.wave27_ops import _LP_CAP


def _degrees(edges):
    return (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def test_default_fixture_is_pinned(spark):
    # measured once at creation (2026-08-17); the generator is
    # hash-deterministic so these are exact, not statistical
    edges = powerlaw_edges(spark).localCheckpoint()
    assert edges.count() == 69064
    s = _degrees(edges).agg(
        F.count(F.lit(1)).alias("nodes"),
        F.max("degree").alias("max_deg"),
        F.expr("percentile(degree, 0.5)").alias("median_deg"),
        F.sum((F.col("degree") > _LP_CAP).cast("int")).alias("hubs"),
    ).first()
    assert s["nodes"] == 4000
    assert s["max_deg"] == 771
    assert s["hubs"] == 284

    # the degree-tail shape the recall claim rests on: median well
    # under the cap (mass keeps full lists), hubs far above it
    assert s["median_deg"] < _LP_CAP / 2
    assert s["max_deg"] > 10 * _LP_CAP
    assert s["hubs"] / s["nodes"] < 0.10


def test_generator_is_deterministic_and_canonical(spark):
    e1 = powerlaw_edges(spark, n=400, dmax=80.0, seed=7)
    e2 = powerlaw_edges(spark, n=400, dmax=80.0, seed=7)
    rows1 = sorted((r["pa"], r["pb"]) for r in e1.collect())
    rows2 = sorted((r["pa"], r["pb"]) for r in e2.collect())
    assert rows1 == rows2
    assert all(a < b for a, b in rows1)  # canonical orientation
    assert len(rows1) == len(set(rows1))  # no duplicate edges


def test_seed_changes_graph(spark):
    a = sorted(
        (r["pa"], r["pb"])
        for r in powerlaw_edges(spark, n=400, dmax=80.0, seed=1).collect()
    )
    b = sorted(
        (r["pa"], r["pb"])
        for r in powerlaw_edges(spark, n=400, dmax=80.0, seed=2).collect()
    )
    assert a != b
