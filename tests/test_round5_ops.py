"""Structural properties of the round-5 additions that the value
oracles can't see: triangle-count invariance under orientation, EWMA
recursion equivalence, compaction mass conservation, SCD2 interval
partitioning, merge-state algebra on adversarial splits — checked at
smoke scale where exact recomputation is cheap.
"""

from __future__ import annotations

import math

import pytest
from datetime import date

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all

SF = "/root/testdata/sf0.001"
REGISTRY = load_all()


# --- graph ------------------------------------------------------------


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered wedge enumeration must count exactly the
    triangles a brute-force id-ordered triple join finds — orientation
    changes the join sizes, never the count."""
    row = REGISTRY["copurchase_triangle_census"].fn(spark, SF).collect()[0]
    pl = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k").filter(F.col("pa") < F.col("pb")).select("pa", "pb").distinct()
    ).cache()
    e1 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    e3 = edges.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    brute = (
        e1.join(e2, "x")
        .filter(F.col("y") < F.col("z"))
        .join(e3, ["y", "z"])
        .count()
    )
    assert row["n_triangles"] == brute
    assert row["n_edges"] == edges.count()
    edges.unpersist()


def test_degree_distribution_totals(spark):
    """sum(degree * n_parts) over the histogram == 2 * n_edges
    (handshake lemma), and sum(n_parts) == n_nodes."""
    census = REGISTRY["copurchase_triangle_census"].fn(spark, SF).collect()[0]
    hist = REGISTRY["part_degree_distribution"].fn(spark, SF).collect()
    assert sum(r["degree"] * r["n_parts"] for r in hist) == 2 * census["n_edges"]
    assert sum(r["n_parts"] for r in hist) == census["n_nodes"]


# --- incremental ------------------------------------------------------


def test_merge_invariant_under_any_split(spark):
    """The partial-state merge must give identical results for ANY
    batch boundary, not just the registered one — merge three disjoint
    splits and compare to the registered two-way merge."""
    from ocean_data_pipeline_spark.queries.incremental import incremental_agg_merge

    two_way = {r["ship_month"]: r for r in incremental_agg_merge(spark, SF).collect()}
    li = table(spark, SF, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice"
    )

    def partial(df):
        return df.groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-01").alias(
                "ship_month"
            )
        ).agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("p_sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p_sum_price"),
            F.min("l_extendedprice").alias("p_min"),
            F.max("l_extendedprice").alias("p_max"),
        )

    c1, c2 = F.lit("1997-01-01").cast("timestamp"), F.lit("1999-07-01").cast(
        "timestamp"
    )
    three_way = (
        partial(li.filter(F.col("l_shipdate") < c1))
        .unionByName(
            partial(
                li.filter((F.col("l_shipdate") >= c1) & (F.col("l_shipdate") < c2))
            )
        )
        .unionByName(partial(li.filter(F.col("l_shipdate") >= c2)))
        .groupBy("ship_month")
        .agg(
            F.sum("p_n").alias("n_rows"),
            F.sum("p_sum_qty").cast("double").alias("sum_qty"),
            F.round(
                F.sum("p_sum_price").cast("double") / F.sum("p_n"), 2
            ).alias("avg_price"),
            F.min("p_min").alias("min_price"),
            F.max("p_max").alias("max_price"),
        )
        .collect()
    )
    assert len(three_way) == len(two_way)
    for r in three_way:
        t = two_way[r["ship_month"]]
        assert (r["n_rows"], r["sum_qty"], r["avg_price"]) == (
            t["n_rows"],
            t["sum_qty"],
            t["avg_price"],
        )
        assert (r["min_price"], r["max_price"]) == (t["min_price"], t["max_price"])


def test_scd2_intervals_partition_the_stream(spark):
    """Per customer: interval order counts sum to the customer's order
    count, exactly one interval is current, and consecutive intervals
    chain (valid_to == next valid_from, priorities differ across the
    boundary)."""
    rows = REGISTRY["scd2_priority_history"].fn(spark, SF).collect()
    orders_per_cust = {
        r["o_custkey"]: r["n"]
        for r in table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    assert set(by_cust) == set(orders_per_cust)
    for ck, ivs in by_cust.items():
        assert sum(r["n_orders"] for r in ivs) == orders_per_cust[ck]
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["priority"] != nxt["priority"]


# --- timeseries -------------------------------------------------------


def test_ewma_matches_iterative_recursion(spark):
    """The closed-form prefix-sum EWMA must equal the literal
    e_n = 0.3*r_n + 0.7*e_{n-1} recursion computed row by row."""
    rows = REGISTRY["ewma_monthly_revenue"].fn(spark, SF).collect()
    assert rows
    e = None
    for r in rows:
        e = r["revenue"] if e is None else 0.3 * r["revenue"] + 0.7 * e
        assert math.isclose(r["ewma"], round(e, 2), abs_tol=0.011), (
            r["month"],
            r["ewma"],
            e,
        )
        e = r["ewma"]  # re-anchor on the rounded value like a consumer would


def test_zscore_anomalies_verify_against_window(spark):
    """Each flagged day's z-score must reproduce from the raw trailing
    window (exclusive of the day itself) recomputed in plain Python."""
    flagged = REGISTRY["daily_zscore_anomalies"].fn(spark, SF).collect()
    daily = (
        table(spark, SF, "orders")
        .groupBy(F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .orderBy("day")
        .collect()
    )
    series = [(r["day"], float(r["rev"])) for r in daily]
    idx = {d: i for i, (d, _) in enumerate(series)}
    for r in flagged:
        i = idx[r["day"]]
        window = [v for _, v in series[max(0, i - 28) : i]]
        assert len(window) >= 8
        mu = sum(window) / len(window)
        var = sum((v - mu) ** 2 for v in window) / (len(window) - 1)
        z = (series[i][1] - mu) / math.sqrt(var)
        assert abs(z) > 2
        assert math.isclose(r["zscore"], round(z, 3), abs_tol=0.002)


# --- layout -----------------------------------------------------------


def test_compaction_plan_conserves_rows_and_order(spark):
    """The plan must account for every row exactly once, keep
    partition spans non-overlapping and ordered, and never emit more
    files than ceil(total/target) + 1 (first-fit-in-order bound)."""
    plan = REGISTRY["compaction_plan"].fn(spark, SF).collect()
    total = table(spark, SF, "lineitem").count()
    assert sum(r["total_rows"] for r in plan) == total
    for prev, nxt in zip(plan, plan[1:]):
        assert prev["last_part"] <= nxt["first_part"]
        assert prev["file_id"] < nxt["file_id"]
    assert len(plan) <= total // 5000 + 2


def test_bucket_histogram_conserves_rows_and_keys(spark):
    """Bucket loads sum to the table row count; per-bucket key counts
    sum to the global distinct-key count (the mix is a function, so
    buckets partition the key space)."""
    hist = REGISTRY["shuffle_bucket_histogram"].fn(spark, SF).collect()
    o = table(spark, SF, "orders")
    assert sum(r["n_rows"] for r in hist) == o.count()
    assert (
        sum(r["n_keys"] for r in hist)
        == o.select("o_custkey").distinct().count()
    )
    assert all(0 <= r["bucket"] < 32 for r in hist)


# --- interval ---------------------------------------------------------


def test_fiscal_windows_cover_each_month_thrice(spark):
    """Month m's revenue appears in every anchored window whose 3-month
    span contains m: with a contiguous month range, interior months are
    counted by exactly 3 windows — so sum(window_rev) ~= 3x total
    revenue minus the two edge months' shortfall. Verify by direct
    recomputation per window."""
    windows = {
        r["window_start"]: r
        for r in REGISTRY["fiscal_window_rollup"].fn(spark, SF).collect()
    }
    months = (
        table(spark, SF, "lineitem")
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("mon"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            ).alias("rev")
        )
        .collect()
    )
    by_month = {r["mon"]: float(r["rev"]) for r in months}
    for w0_str, row in windows.items():
        w0 = date.fromisoformat(w0_str)
        span = [
            m
            for m in by_month
            if (m.year * 12 + m.month) - (w0.year * 12 + w0.month) in (0, 1, 2)
        ]
        assert row["n_months"] == len(span)
        assert math.isclose(
            row["window_rev"], round(sum(by_month[m] for m in span), 2), abs_tol=0.02
        )


def test_overlap_pairs_bounded_by_order_sizes(spark):
    """Overlapping pairs can never exceed C(order size, 2) summed over
    orders, and the count must equal a per-order Python recount."""
    row = REGISTRY["shipment_overlap_pairs"].fn(spark, SF).collect()[0]
    li = (
        table(spark, SF, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .collect()
    )
    by_order: dict[int, list] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], []).append(r)
    n_pairs = 0
    orders_hit = 0
    for rows_ in by_order.values():
        hit = False
        # NB: (orderkey, linenumber) is NOT unique in the testdata;
        # the query pairs rows by STRICT linenumber inequality, so a
        # row never pairs with a same-linenumber sibling — mirror that.
        for a in rows_:
            for b in rows_:
                if a["l_linenumber"] < b["l_linenumber"] and (
                    abs((b["l_shipdate"] - a["l_shipdate"]).days) <= 7
                ):
                    n_pairs += 1
                    hit = True
        orders_hit += hit
    assert row["n_pairs"] == n_pairs
    assert row["n_orders_with_overlap"] == orders_hit


# --- batch 2: pagerank / PIT join / audits ----------------------------


def test_pagerank_matches_python_reference(spark):
    """Top-20 ranks must equal a pure-Python power iteration on the
    collected edge list (3 rounds, d=0.85), and total rank mass over
    all nodes must stay exactly 1 (no dangling nodes by construction)."""
    from ocean_data_pipeline_spark.queries.graph_ops import _copurchase_edges

    edges = [(r["pa"], r["pb"]) for r in _copurchase_edges(spark, SF).collect()]
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    pr = {v: 1.0 / n for v in adj}
    for _ in range(3):
        nxt = {}
        for v in adj:
            nxt[v] = 0.15 / n + 0.85 * sum(pr[u] / len(adj[u]) for u in adj[v])
        pr = nxt
    assert math.isclose(sum(pr.values()), 1.0, abs_tol=1e-9)
    expected = sorted(
        ((round(p, 10), node) for node, p in pr.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = REGISTRY["pagerank_copurchase_top20"].fn(spark, SF).collect()
    assert [(r["pagerank"], r["node"]) for r in got] == expected


def test_pit_join_accounts_for_every_order(spark):
    """The point-in-time probe must match every order to exactly one
    interval: matrix cell counts sum to the order count."""
    cells = REGISTRY["scd2_point_in_time_join"].fn(spark, SF).collect()
    n_orders = table(spark, SF, "orders").count()
    assert sum(r["n_orders"] for r in cells) == n_orders
    assert all(r["n_orders"] > 0 for r in cells)


def test_dq_census_recounts(spark):
    """Rule census must agree with direct recounts, and checked
    denominators must be the right relations (scan vs join)."""
    rows = {r["rule"]: r for r in REGISTRY["dq_constraint_census"].fn(spark, SF).collect()}
    assert set(rows) == {
        "nonpositive_quantity",
        "discount_out_of_range",
        "negative_price",
        "null_order_key",
        "ship_before_order",
        "orphan_lineitem",
    }
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders").select("o_orderkey", "o_orderdate")
    n_li = li.count()
    for rule in ("nonpositive_quantity", "discount_out_of_range",
                 "negative_price", "null_order_key", "orphan_lineitem"):
        assert rows[rule]["n_checked"] == n_li
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    assert rows["ship_before_order"]["n_checked"] == joined.count()
    assert (
        rows["ship_before_order"]["n_violations"]
        == joined.filter(F.col("l_shipdate") < F.col("o_orderdate")).count()
    )
    assert (
        rows["orphan_lineitem"]["n_violations"]
        == n_li
        - li.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi").count()
    )


def test_chisq_matches_python_reference(spark):
    """Chi-square statistic must reproduce from the collected
    contingency table, including structural zero cells."""
    row = REGISTRY["segment_priority_chisq"].fn(spark, SF).collect()[0]
    base = (
        table(spark, SF, "orders")
        .select("o_custkey", "o_orderpriority")
        .join(
            table(spark, SF, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .count()
        .collect()
    )
    segs = sorted({r["c_mktsegment"] for r in base})
    pris = sorted({r["o_orderpriority"] for r in base})
    obs = {(r["c_mktsegment"], r["o_orderpriority"]): r["count"] for r in base}
    grand = sum(obs.values())
    row_tot = {s: sum(obs.get((s, p), 0) for p in pris) for s in segs}
    col_tot = {p: sum(obs.get((s, p), 0) for s in segs) for p in pris}
    chi2 = sum(
        (obs.get((s, p), 0) - row_tot[s] * col_tot[p] / grand) ** 2
        / (row_tot[s] * col_tot[p] / grand)
        for s in segs
        for p in pris
    )
    assert row["n_obs"] == grand
    assert row["n_cells"] == len(segs) * len(pris)
    assert row["dof"] == (len(segs) - 1) * (len(pris) - 1)
    assert math.isclose(row["chi2"], round(chi2, 4), abs_tol=0.0002)


def test_conversion_latency_matches_python_quantiles(spark):
    """Exact percentiles must reproduce with numpy linear
    interpolation over the per-user latency list."""
    import numpy as np

    row = REGISTRY["conversion_latency_percentiles"].fn(spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("user_id", "event_type", "ts").collect()
    first_view: dict[int, object] = {}
    for r in ev:
        if r["event_type"] == "view" and (
            r["user_id"] not in first_view or r["ts"] < first_view[r["user_id"]]
        ):
            first_view[r["user_id"]] = r["ts"]
    first_purchase: dict[int, object] = {}
    for r in ev:
        if (
            r["event_type"] == "purchase"
            and r["user_id"] in first_view
            and r["ts"] > first_view[r["user_id"]]
            and (
                r["user_id"] not in first_purchase
                or r["ts"] < first_purchase[r["user_id"]]
            )
        ):
            first_purchase[r["user_id"]] = r["ts"]
    lats = [
        (first_purchase[u] - first_view[u]).total_seconds() for u in first_purchase
    ]
    assert row["n_converted"] == len(lats)
    if lats:
        for col, q in (("p50_s", 0.5), ("p90_s", 0.9), ("p99_s", 0.99)):
            assert math.isclose(
                row[col], round(float(np.quantile(lats, q)), 3), abs_tol=0.002
            ), (col, row[col])
        assert math.isclose(row["max_s"], round(max(lats), 3), abs_tol=0.002)


@pytest.mark.slow
def test_stream_ewma_equals_batch_twin(spark):
    """The stateful streaming smoother must emit exactly the batch
    closed-form EWMA relation — streaming == batch for the whole
    pipeline, state carried across 6-month micro-batches
    (maxFilesPerTrigger=1 guarantees > 1 batch at smoke scale)."""
    batch = REGISTRY["ewma_monthly_revenue"].fn(spark, SF).collect()
    stream = REGISTRY["stream_ewma_monthly"].fn(spark, SF).collect()
    assert len(batch) > 6  # enough months for several micro-batches
    assert [(r["month"], r["revenue"]) for r in stream] == [
        (r["month"], r["revenue"]) for r in batch
    ]
    for s, b in zip(stream, batch):
        # closed-form vs recursion may straddle a .xx5 boundary by one
        # cent (each side is pinned exactly by its own oracle)
        assert math.isclose(s["ewma"], b["ewma"], abs_tol=0.011), (s, b)


def test_top_component_matches_numpy_power_iteration(spark):
    """The distributed power iteration must reproduce numpy running
    the SAME 6 iterations from the same start vector on the exactly
    recomputed covariance (spectrum here is near-degenerate, so only
    the matched-iteration comparison is meaningful, not the true
    eigenvector), and the loading vector must be unit-norm."""
    import numpy as np

    rows = REGISTRY["embedding_top_component"].fn(spark, SF).collect()
    emb = table(spark, SF, "embeddings").select("embedding").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    n, d = X.shape
    C = (X.T @ X) / n - np.outer(X.sum(0), X.sum(0)) / (n * n)
    v = np.ones(d) / np.sqrt(d)
    for _ in range(6):
        w = C @ v
        lam = float(np.sqrt((w * w).sum()))
        v = w / lam
    if v[0] < 0:
        v = -v
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim_idx"])])
    assert len(got) == d
    assert abs(float(np.sqrt((got * got).sum())) - 1.0) < 1e-3
    assert float(np.abs(got - v).max()) < 5e-5, float(np.abs(got - v).max())
    assert abs(rows[0]["eigenvalue"] - lam) < 1e-4


def test_gram_operator_equals_pair_explode(spark):
    """The mapInPandas Gram accumulation (the 100 TB cutover documented
    in embedding_decomp) must equal the pair-explode covariance within
    float-sum reassociation noise, cell by cell."""
    from ocean_data_pipeline_spark.operators.gram import covariance_matrix

    emb = table(spark, SF, "embeddings").select("vec_id", "embedding")
    fast = {
        (r["i"], r["j"]): r["v"]
        for r in covariance_matrix(emb, "embedding").collect()
    }
    x = emb.select("vec_id", F.posexplode("embedding").alias("i", "xi")).select(
        "vec_id", "i", F.col("xi").cast("double").alias("xi")
    )
    n = emb.count()
    a = x.select("vec_id", F.col("i").alias("ai"), F.col("xi").alias("ax"))
    b = x.select("vec_id", F.col("i").alias("bi"), F.col("xi").alias("bx"))
    s = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bi").alias("j"))
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("sij"))
    )
    m = x.groupBy("i").agg(F.sum("xi").alias("mi"))
    slow = {
        (r["i"], r["j"]): r["v"]
        for r in s.join(
            m.select(F.col("i").alias("_a"), F.col("mi").alias("ma")),
            F.col("i") == F.col("_a"),
        )
        .join(
            m.select(F.col("i").alias("_b"), F.col("mi").alias("mb")),
            F.col("j") == F.col("_b"),
        )
        .select("i", "j", (F.col("sij") / n - F.col("ma") * F.col("mb") / (n * n)).alias("v"))
        .collect()
    }
    assert set(fast) == set(slow) and len(fast) > 0
    for k, v in fast.items():
        assert math.isclose(v, slow[k], rel_tol=1e-9, abs_tol=1e-12), (k, v, slow[k])
