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


def test_url_census_extraction_complete(spark):
    rows = REGISTRY["url_domain_census"].fn(spark, SF_ORACLE).collect()
    tlds = {r.tld for r in rows}
    assert tlds == {"com", "net", "org"}
    n_docs = table(spark, SF_ORACLE, "documents").count()
    by = {r.tld: r for r in rows}
    # injection arithmetic: %3 -> .com, %4 -> .net, %10 -> .org
    assert by["com"].n_urls == sum(1 for i in range(n_docs) if i % 3 == 0)
    assert by["net"].n_urls == sum(1 for i in range(n_docs) if i % 4 == 0)
    assert by["org"].n_urls == sum(1 for i in range(n_docs) if i % 10 == 0)
    # all .net injections hit the assets blocklist; others never do
    assert by["net"].n_blocklisted == by["net"].n_urls
    assert by["com"].n_blocklisted == 0 and by["org"].n_blocklisted == 0
    assert math.isclose(sum(r.url_share for r in rows), 1.0, rel_tol=1e-12)


def test_encoding_advisor_sane(spark):
    rows = REGISTRY["encoding_advisor"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    n = table(spark, SF_ORACLE, "lineitem").count()
    for r in rows:
        assert r.n == n
        assert 1 <= r.ndv <= r.n
        assert r.ndv <= r.runs <= r.n  # every distinct value starts >=1 run
        best_bytes = {"plain": r.plain_bytes, "dict": r.dict_bytes, "rle": r.rle_bytes}
        assert best_bytes[r.best] == min(best_bytes.values())
    by = {r.column_name: r for r in rows}
    # 3-value flag columns dictionary- or RLE-encode far below plain
    assert by["l_returnflag"].best != "plain"
    assert by["l_returnflag"].ndv <= 4


def test_impute_shifts_mean_toward_median(spark):
    rows = REGISTRY["impute_missing_values"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_null < r.n
        if r.n_null == 0:
            assert math.isclose(r.mean_before, r.mean_after, rel_tol=1e-12)
        else:
            # imputed mean lies between the original mean and the median
            lo, hi = sorted((r.mean_before, r.median_fill))
            assert lo - 1e-9 <= r.mean_after <= hi + 1e-9


def test_hotspot_clusters_contract(spark):
    rows = REGISTRY["grid_hotspot_clusters"].fn(spark, SF_ORACLE).collect()
    assert rows
    # recompute the dense-cell set brute force and check conservation
    li = table(spark, SF_ORACLE, "lineitem")
    cells = (
        li.groupBy(
            F.col("l_quantity").cast("int").alias("x"),
            F.floor(F.col("l_extendedprice") / 5000).cast("int").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(c.n for c in cells)
    thresh = 1.25 * (total / len(cells))
    dense = {(c.x, c.y): c.n for c in cells if c.n >= thresh}
    assert sum(r.n_cells for r in rows) == len(dense)
    assert sum(r.n_points for r in rows) == sum(dense.values())
    # cluster count equals a brute-force union-find over 8-adjacency
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (x, y) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) != (0, 0) and (x + dx, y + dy) in dense:
                    parent[find((x, y))] = find((x + dx, y + dy))
    n_components = len({find(c) for c in dense})
    assert len(rows) == n_components
    # per-cluster sizes ordered
    sizes = [r.n_points for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_sql_filter_clause_matches_case_formulation(spark):
    got = {r.priority: r for r in REGISTRY["sql_filter_clause_agg"].fn(spark, SF_ORACLE).collect()}
    ref = (
        table(spark, SF_ORACLE, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_large"),
        )
        .collect()
    )
    assert len(got) == len(ref) > 0
    for r in ref:
        g = got[r.priority]
        assert (g.n_orders, g.n_finished, g.n_large) == (
            r.n_orders,
            r.n_finished,
            r.n_large,
        )


def test_mann_kendall_matches_python(spark):
    r = REGISTRY["mann_kendall_trend"].fn(spark, SF_ORACLE).collect()[0]
    m = (
        table(spark, SF_ORACLE, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("mo"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
        .orderBy("mo")
        .collect()
    )
    xs = [float(v.x) for v in m]
    n = len(xs)
    s = sum(
        (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert r.n_periods == n
    assert r.s_stat == s
    assert r.n_pairs == n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0  # no ties in cents-exact revenue
    assert math.isclose(r.var_s, var, rel_tol=1e-12)
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    assert math.isclose(r.z_stat, z, rel_tol=1e-12)
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    import numpy as np

    assert math.isclose(
        r.theil_sen_slope, float(np.quantile(slopes, 0.5)), rel_tol=1e-9
    )


def test_seasonal_indices_normalized(spark):
    rows = REGISTRY["seasonal_indices_monthly"].fn(spark, SF_ORACLE).collect()
    assert [r.month for r in rows] == list(range(1, 13))
    assert math.isclose(
        sum(r.normalized_index for r in rows), 12.0, rel_tol=1e-9
    )
    for r in rows:
        assert 0.5 < r.raw_index < 2.0  # multiplicative indices near 1
        assert r.n_obs >= 5


def test_apriori_antimonotone(spark):
    rows = REGISTRY["frequent_triples_apriori"].fn(spark, SF_ORACLE).collect()
    assert rows
    op = (
        table(spark, SF_ORACLE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in op:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    for r in rows:
        assert r.part_a < r.part_b < r.part_c
        exact = sum(
            1
            for items in baskets.values()
            if r.part_a in items and r.part_b in items and r.part_c in items
        )
        assert r.support == exact and r.support >= 2
        # anti-monotonicity: every sub-pair occurs at least `support` times
        for x, y in ((r.part_a, r.part_b), (r.part_a, r.part_c), (r.part_b, r.part_c)):
            pair_supp = sum(
                1 for items in baskets.values() if x in items and y in items
            )
            assert pair_supp >= r.support


def test_interval_coverage_matches_python(spark):
    rows = REGISTRY["interval_coverage_days"].fn(spark, SF_ORACLE).collect()
    orders = (
        table(spark, SF_ORACLE, "orders")
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("s"))
        .collect()
    )
    import datetime

    by_cust = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r.s)
    got = {r.o_custkey: r for r in rows}
    assert set(got) == set(by_cust)
    for cust, starts in list(by_cust.items())[:200]:
        ivs = sorted((s, s + datetime.timedelta(days=7)) for s in starts)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum((e - s).days for s, e in merged)
        r = got[cust]
        assert r.n_islands == len(merged), cust
        assert r.covered_days == covered, cust
        assert r.n_orders == len(starts), cust
