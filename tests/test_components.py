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
    # local_edge_cap=0 forces the iterative path (the guard under test)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2, local_edge_cap=0)


def test_local_and_iterative_paths_agree(spark):
    # Round-11: the single-task union-find fast path must produce the
    # exact labels of the iterative min-label fixpoint on every
    # topology class — chain (worst case for propagation), two blobs,
    # duplicate/self edges, and a seeded random graph.
    import random

    rng = random.Random(11)
    cases = [
        [(i, i + 1) for i in range(12)],
        [(2, 1), (2, 3), (10, 11), (11, 10), (5, 5)],
        [(rng.randrange(40), rng.randrange(40)) for _ in range(60)],
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "src long, dst long")
        fast = _labels(connected_components(df))  # default cap: fast path
        loop = _labels(connected_components(df, local_edge_cap=0))
        assert fast == loop


def test_empty_edges_both_paths(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert _labels(connected_components(df)) == {}
    assert _labels(connected_components(df, local_edge_cap=-1)) == {}


# --- large-star/small-star contraction fallback -----------------------

import math
import random

from ocean_data_pipeline_spark.operators.components import connected_components_star


def test_star_basic_components(spark):
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "src long, dst long"
    )
    got = _labels(connected_components_star(edges))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_matches_min_label_on_random_graphs(spark):
    """Both paths must produce IDENTICAL labelings: random sparse
    graphs across several seeds (mixed component counts and shapes)."""
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(100)
        ]
        df = spark.createDataFrame(
            [(a, b) for a, b in edges if a != b], "src long, dst long"
        )
        assert _labels(connected_components_star(df)) == _labels(
            connected_components(df)
        ), f"divergence at seed {seed}"


def test_star_chain_converges_in_log_rounds(spark):
    """The adversarial case the fallback exists for: a path graph of
    n nodes, where plain min-propagation needs O(n) rounds (pointer
    jumping gets O(log n); star contraction is O(log n) on ANY
    topology). Bound from Kiveris et al.: < 2·log2(n) + 4 rounds."""
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, rounds = connected_components_star(edges, return_rounds=True)
    assert _labels(labels) == {i: 0 for i in range(n)}
    bound = 2 * math.ceil(math.log2(n)) + 4
    assert rounds <= bound, f"star contraction took {rounds} > {bound} rounds"


def test_star_empty_and_self_loop_edges(spark):
    df = spark.createDataFrame([(5, 5), (6, 7)], "src long, dst long")
    assert _labels(connected_components_star(df)) == {5: 5, 6: 6, 7: 6}
