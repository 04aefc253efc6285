"""Invariant + reference-recompute tests for wave 21: local clustering
coefficient census, rolling-origin forecast backtest, reciprocal-NN
pairs, FD violation census.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_clustering_coefficient_matches_pure_python(spark):
    out = (
        REGISTRY["clustering_coefficient_census"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("degree_band")
    )
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(grp.l_partkey.unique()), 2):
            edges.add((a, b))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(n for n in adj if len(adj[n]) >= 2)
    cc = {}
    tri = {}
    for v in nodes:
        nb = adj[v]
        t = sum(1 for a, b in itertools.combinations(sorted(nb), 2) if (a, b) in edges)
        tri[v] = t
        d = len(nb)
        cc[v] = round(2.0 * t / (d * (d - 1.0)), 12)
    # ntile(4) over (degree, node)
    order = sorted(nodes, key=lambda v: (len(adj[v]), v))
    n = len(order)
    base, extra = divmod(n, 4)
    sizes = [base + 1] * extra + [base] * (4 - extra)
    pos = 0
    for band, sz in enumerate(sizes, start=1):
        chunk = order[pos : pos + sz]
        pos += sz
        assert out.loc[band, "n_nodes"] == sz
        assert out.loc[band, "triangle_incidences"] == sum(tri[v] for v in chunk)
        ref_cc = sum(cc[v] for v in chunk) / sz
        assert abs(out.loc[band, "avg_clustering"] - ref_cc) < 1e-6, band
    # quartiles ordered by degree -> avg_degree nondecreasing
    assert (out.sort_index().avg_degree.diff().dropna() >= -1e-9).all()


def test_forecast_backtest_matches_numpy(spark):
    out = (
        REGISTRY["forecast_backtest_mape"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("method")
    )
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .toPandas()
    )
    o["idx"] = o.o_orderdate.map(lambda d: d.year * 12 + d.month)
    m = (
        o.groupby("idx")
        .o_totalprice.apply(lambda s: float(sum(round(v, 2) for v in s)))
        .sort_index()
    )
    y = m.to_numpy()
    n = len(y)
    rows = []
    for t in range(1, n + 1):  # 1-based like the query
        if t <= n - 12 or t <= 12 or t <= 2:
            continue
        rows.append(
            {
                "actual": y[t - 1],
                "naive": y[t - 2],
                "seasonal_naive": y[t - 13],
                "drift": y[t - 2] + (y[t - 2] - y[0]) / (t - 2.0),
            }
        )
    ref = pd.DataFrame(rows)
    for method in ("naive", "seasonal_naive", "drift"):
        ape = (ref.actual - ref[method]).abs() / ref.actual.abs()
        mape = float(ape.mean()) * 100
        rmse = float(np.sqrt(((ref.actual - ref[method]) ** 2).mean()))
        assert out.loc[method, "n_origins"] == len(ref), method
        assert abs(out.loc[method, "mape_pct"] - mape) < 1e-3, method
        assert abs(out.loc[method, "rmse"] - rmse) < 0.5, method
    assert (out.mape_pct > 0).all()


def test_reciprocal_nn_matches_numpy(spark):
    out = REGISTRY["reciprocal_nn_pairs"].fn(spark, SF_SMOKE).toPandas()
    df = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    ids = df.vec_id.to_numpy()
    labels = df.label.to_numpy()
    mat = np.array([np.array(v, dtype=np.float64) for v in df.embedding])
    norms = np.sqrt((mat * mat).sum(axis=1))
    top1 = {}
    for i in range(len(ids)):
        sims = (mat @ mat[i]) / (norms * norms[i])
        j = min(
            (k for k in range(len(ids)) if ids[k] != ids[i]),
            key=lambda k: (-sims[k], ids[k]),
        )
        top1[ids[i]] = ids[j]
    ref_pairs = sorted(
        (a, b) for a, b in top1.items() if top1.get(b) == a and a < b
    )
    got = sorted(zip(out.id_a, out.id_b))
    assert got == ref_pairs
    # mutual top-1 is symmetric and self-free
    assert (out.id_a < out.id_b).all()
    # labels should mostly agree on mutual matches (precision claim)
    lbl = dict(zip(ids, labels))
    same = [lbl[a] == lbl[b] for a, b in ref_pairs]
    assert out.same_label.sum() == sum(same)


def test_fd_census_truths_and_repairs(spark):
    out = (
        REGISTRY["fd_violation_census"]
        .fn(spark, SF_ORACLE)
        .toPandas()
        .set_index("fd")
    )
    # declared-true FDs hold exactly
    for fd in ("customer: name -> nationkey", "nation: name -> regionkey"):
        assert out.loc[fd, "n_violating_groups"] == 0, fd
        assert out.loc[fd, "min_repair_rows"] == 0
        assert out.loc[fd, "fd_support"] == 1.0
    # pandas recompute for one violated FD
    orders = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .select("o_custkey", "o_orderpriority")
        .toPandas()
    )
    g = orders.groupby("o_custkey").o_orderpriority
    viol = int((g.nunique() > 1).sum())
    repair = int((g.count() - g.agg(lambda s: s.value_counts().max())).sum())
    fd = "orders: custkey -> orderpriority"
    assert out.loc[fd, "n_violating_groups"] == viol
    assert out.loc[fd, "min_repair_rows"] == repair
    assert out.loc[fd, "n_rows"] == len(orders)
    # support = 1 - repairs/rows
    assert abs(out.loc[fd, "fd_support"] - (1 - repair / len(orders))) < 1e-6
