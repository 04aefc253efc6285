"""connected_components: transitive closure of pair evidence (the
keep-one-representative step of near-dup clustering)."""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.operators.components import connected_components


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_two_components_and_transitivity(spark):
    # 1-2-3 chained (1≈2, 2≈3 but NOT 1≈3) plus isolated pair 10-11:
    # transitivity must put 3 with 1 anyway.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "src long, dst long"
    )
    got = _labels(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_direction_irrelevant(spark):
    fwd = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rev = spark.createDataFrame([(3, 2), (2, 1)], "src long, dst long")
    assert _labels(connected_components(fwd)) == _labels(connected_components(rev))


def test_chain_converges_in_diameter_rounds(spark):
    # path 0-1-...-7: worst case for label propagation (diameter 7)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src long, dst long"
    )
    got = _labels(connected_components(edges))
    assert got == {i: 0 for i in range(8)}


def test_nonconvergence_guard_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)
