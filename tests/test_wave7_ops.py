"""Invariant tests for the wave-7 time-series family (ACF, CUSUM,
LOCF). Two-scale oracle parity pins exact values; these pin the
semantic contracts: ACF equals the textbook centered formula (numpy),
CUSUM equals the iterative recursion, LOCF carries the right value
with the right staleness.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_acf_matches_numpy(spark):
    import numpy as np

    rows = REGISTRY["acf_monthly_revenue"].fn(spark, SF_ORACLE).collect()
    assert [r.k for r in rows] == [1, 2, 3, 4, 5, 6]
    m = (
        table(spark, SF_ORACLE, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("mo"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("x"))
        .orderBy("mo")
        .collect()
    )
    x = np.array([r.x for r in m])
    mu, den = x.mean(), ((x - x.mean()) ** 2).sum()
    for r in rows:
        expect = float(((x[: -r.k] - mu) * (x[r.k :] - mu)).sum() / den)
        assert math.isclose(r.acf, expect, rel_tol=1e-9), (r.k, r.acf, expect)
        assert -1.0 <= r.acf <= 1.0
        assert r.npairs == len(x) - r.k


def test_cusum_matches_iterative_recursion(spark):
    d = (
        table(spark, SF_ORACLE, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = [r.x for r in d]
    mu = sum(xs) / len(xs)
    s, best = 0.0, {}
    for r in d:
        s += r.x - mu
        best[r.day] = s
    got = REGISTRY["cusum_changepoint"].fn(spark, SF_ORACLE).collect()
    assert len(got) == 5
    abss = [r.abs_cusum for r in got]
    assert abss == sorted(abss, reverse=True)
    # the reported peak must be the global max of the recursion
    peak = max(abs(v) for v in best.values())
    assert math.isclose(got[0].abs_cusum, peak, rel_tol=1e-9)
    for r in got:
        assert math.isclose(r.cusum, best[r.day.date()], rel_tol=1e-9), r


def test_locf_carries_last_observation(spark):
    rows = REGISTRY["locf_forward_fill"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 61
    last_price, last_day = None, None
    for r in rows:
        if r.n_orders > 0:
            last_price, last_day = r.filled_price, r.day
            assert not r.was_filled
            assert r.gap_age_days == 0
        elif last_price is None:
            assert r.filled_price == 0.0 and not r.was_filled
            assert r.gap_age_days == -1
        else:
            assert r.filled_price == last_price
            assert r.was_filled
            assert r.gap_age_days == (r.day - last_day).days


def test_bfs_levels_partition_catalog(spark):
    rows = REGISTRY["bfs_reachability"].fn(spark, SF_ORACLE).collect()
    assert [r.dist for r in rows] == [-1, 0, 1, 2, 3]
    n_parts = table(spark, SF_ORACLE, "part").count()
    assert sum(r.n_nodes for r in rows) == n_parts
    assert math.isclose(sum(r.node_share for r in rows), 1.0, rel_tol=1e-12)
    by_dist = {r.dist: r.n_nodes for r in rows}
    n_seeds = (
        table(spark, SF_ORACLE, "part").filter(F.col("p_partkey") % 97 == 0).count()
    )
    assert by_dist[0] == n_seeds
    assert by_dist[1] > 0  # seeds are co-purchased with something


def test_item_item_cosine_contract(spark):
    rows = REGISTRY["item_item_cosine_topk"].fn(spark, SF_ORACLE).collect()
    assert rows
    per_item = {}
    for r in rows:
        assert r.c_ij >= 2 and r.c_i >= 5
        assert r.c_ij <= min(r.c_i, r.c_j)  # co-count bounded by marginals
        assert 0.0 < r.cosine <= 1.0
        assert math.isclose(
            r.cosine, r.c_ij / math.sqrt(r.c_i * r.c_j), rel_tol=1e-12
        )
        per_item.setdefault(r.item, []).append((r.rank, r.cosine))
    for item, rs in per_item.items():
        ranks = sorted(k for k, _ in rs)
        assert ranks == list(range(1, len(rs) + 1)), item
        coss = [c for _, c in sorted(rs)]
        assert coss == sorted(coss, reverse=True), item


def test_attribution_conserves_credit(spark):
    rows = REGISTRY["attribution_credit"].fn(spark, SF_ORACLE).collect()
    assert rows
    # one unit of credit per converting journey, exactly
    ev = table(spark, SF_ORACLE, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    n_journeys = (
        ev.join(fp, "user_id")
        .filter((F.col("event_type") != "purchase") & (F.col("ts") < F.col("t_p")))
        .select("user_id")
        .distinct()
        .count()
    )
    assert math.isclose(
        sum(r.total_credit for r in rows), float(n_journeys), rel_tol=1e-12
    )
    assert all(r.n_first <= r.n_touches and r.n_last <= r.n_touches for r in rows)


def test_session_paths_valid(spark):
    rows = REGISTRY["session_path_topn"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 15
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        toks = r.path.split(">")
        assert 1 <= len(toks) <= 8
        assert set(toks) <= types
