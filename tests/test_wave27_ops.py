"""Independent reference-recompute tests for wave 27 (round 7):
RANGE frames, Lorenz deciles, burstiness, the corpus datasheet, link
prediction, and additive Holt-Winters — recomputed in pandas/pure
Python at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def test_rolling_30day_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o = o.assign(
        d=o.o_orderdate.map(lambda x: x.toordinal()),
        rev=np.round(o.o_totalprice, 2),
    )
    peaks = {}
    for ck, sub in o.groupby("o_custkey"):
        sub = sub.sort_values("d")
        best = -1.0
        for _, r in sub.iterrows():
            win = sub[(sub.d >= r.d - 29) & (sub.d <= r.d)].rev.sum()
            best = max(best, win)
        peaks[int(ck)] = round(best, 2)
    want = sorted(
        ((v, k) for k, v in peaks.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    rows = REGISTRY["rolling_30day_revenue"].fn(spark, SF_SMOKE).collect()
    got = [(r.peak_30day_spend, r.custkey) for r in rows]
    assert [
        (round(v, 2), k) for v, k in want
    ] == got


def test_lorenz_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    spend = (
        o.assign(rev=np.round(o.o_totalprice, 2))
        .groupby("o_custkey")
        .rev.sum()
        .sort_values(kind="mergesort")
    )
    # ntile(10) over (x, custkey): stable sort by value then key
    order = sorted(zip(spend.values, spend.index))
    n = len(order)
    q, r = divmod(n, 10)
    rows = REGISTRY["lorenz_curve_deciles"].fn(spark, SF_SMOKE).collect()
    assert [r_.decile for r_ in rows] == list(range(1, 11))
    pos, cum_n, cum_s = 0, 0, 0.0
    total = sum(v for v, _ in order)
    for row in rows:
        size = q + 1 if row.decile <= r else q
        vals = [v for v, _ in order[pos : pos + size]]
        pos += size
        assert row.n_customers == size
        assert math.isclose(row.spend, sum(vals), abs_tol=0.05)
        cum_n += size
        cum_s += sum(vals)
        assert math.isclose(row.cum_pop_share, cum_n / n, abs_tol=1e-6)
        assert math.isclose(row.cum_spend_share, cum_s / total, abs_tol=1e-5)
    # Lorenz curve is convex: shares grow slower than population early
    assert rows[0].cum_spend_share < rows[0].cum_pop_share
    assert math.isclose(rows[-1].cum_spend_share, 1.0, abs_tol=1e-9)


def test_burstiness_matches_numpy(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    bs = []
    for _, sub in ev.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        us = sub.ts.astype("int64").to_numpy() // 1000  # ns -> us
        g = np.diff(us).astype(np.float64)
        if len(g) < 2 or g.sum() <= 0:
            continue
        mu = g.mean()
        sig = math.sqrt((g * g).mean() - mu * mu)
        bs.append((sig - mu) / (sig + mu))
    row = (
        REGISTRY["user_interevent_burstiness"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert row.n_users == len(bs)
    assert math.isclose(row.mean_burstiness, np.mean(bs), abs_tol=1e-4)
    assert row.n_bursty == sum(1 for b in bs if b > 0)
    assert row.n_regular == sum(1 for b in bs if b < -0.5)
    assert -1.0 <= row.min_b <= row.max_b <= 1.0


def test_datasheet_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    row = REGISTRY["corpus_datasheet"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_docs == len(docs)
    assert row.n_sources == docs.source.nunique()
    assert row.n_langs == docs.lang.nunique()
    assert row.total_chars == int(docs.n_chars.sum())
    lens = np.sort(docs.n_chars.to_numpy())
    assert row.median_chars == int(lens[math.ceil(len(lens) / 2) - 1])
    assert math.isclose(
        row.short_doc_share, (lens < 100).mean(), abs_tol=1e-6
    )
    uniq = len({hashlib.sha256(t.encode()).hexdigest() for t in docs.text})
    assert math.isclose(
        row.exact_dup_rate, 1.0 - uniq / len(docs), abs_tol=1e-6
    )


def test_link_prediction_matches_python(spark):
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    orders = defaultdict(set)
    for _, r in li.iterrows():
        orders[r.l_orderkey].add(int(r.l_partkey))
    nbrs = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a < b:
                    nbrs[a].add(b)
                    nbrs[b].add(a)
    cand = defaultdict(int)
    for w, ns in nbrs.items():
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for c in ns[i + 1 :]:
                if c not in nbrs[a]:
                    cand[(a, c)] += 1
    top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = REGISTRY["link_prediction_scores"].fn(spark, SF_SMOKE).collect()
    assert [((r.part_a, r.part_b), r.common_neighbors) for r in rows] == top
    for r in rows:
        a, c = r.part_a, r.part_b
        cn = r.common_neighbors
        jac = cn / (len(nbrs[a]) + len(nbrs[c]) - cn)
        aa = sum(
            1.0 / math.log(len(nbrs[w])) for w in nbrs[a] & nbrs[c]
        )
        assert math.isclose(r.jaccard, jac, abs_tol=1e-5)
        assert math.isclose(r.adamic_adar, aa, abs_tol=1e-4)


def test_holt_winters_matches_python(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o = o.assign(
        month=o.o_orderdate.map(lambda d: f"{d.year:04d}-{d.month:02d}-01"),
        cents=np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64),
    )
    m = o.groupby("month").cents.sum().sort_index() / 100.0
    ys = list(m.values)
    l0 = sum(int(round(y * 100)) for y in ys[:12]) / 100.0 / 12.0
    s = [y - l0 for y in ys[:12]]
    lvl, trd = l0, 0.0
    want = []
    for t in range(13, len(ys) + 1):
        y = ys[t - 1]
        p = (t - 1) % 12
        fitted = lvl + trd + s[p]
        l_new = 0.4 * (y - s[p]) + 0.6 * (lvl + trd)
        t_new = 0.2 * (l_new - lvl) + 0.8 * trd
        s[p] = 0.3 * (y - l_new) + 0.7 * s[p]
        lvl, trd = l_new, t_new
        want.append((m.index[t - 1], l_new, t_new, fitted))
    rows = REGISTRY["holt_winters_additive"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == len(want)
    err_fit, err_naive = 0.0, 0.0
    for r, (month, l_new, t_new, fitted) in zip(rows, want):
        assert r.month == month
        assert math.isclose(r.level, l_new, abs_tol=1e-3)
        assert math.isclose(r.trend, t_new, abs_tol=1e-3)
        assert math.isclose(r.fitted, fitted, abs_tol=1e-3)
        err_fit += abs(r.revenue - r.fitted)
        err_naive += abs(r.revenue)
    # the seasonal model must beat the zero forecast by a wide margin
    assert err_fit < 0.5 * err_naive


def test_link_prediction_capped_matches_python(spark):
    from ocean_data_pipeline_spark.queries.wave27_ops import (
        _LP_CAP,
        _LP_SURVIVORS,
    )

    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    orders = defaultdict(set)
    for _, r in li.iterrows():
        orders[r.l_orderkey].add(int(r.l_partkey))
    nbrs = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a < b:
                    nbrs[a].add(b)
                    nbrs[b].add(a)
    cand = defaultdict(int)
    for w, ns in nbrs.items():
        capped = sorted(ns)[:_LP_CAP]
        for i, a in enumerate(capped):
            for c in capped[i + 1 :]:
                if c not in nbrs[a]:
                    cand[(a, c)] += 1
    surv = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:_LP_SURVIVORS]
    confirmed = sorted(
        (
            (-len(nbrs[a] & nbrs[c]), a, c, cnc)
            for (a, c), cnc in surv
        ),
    )[:20]
    rows = REGISTRY["link_prediction_capped"].fn(spark, SF_SMOKE).collect()
    assert [
        (r.part_a, r.part_b, r.cn_capped, r.common_neighbors) for r in rows
    ] == [(a, c, cnc, -negcn) for negcn, a, c, cnc in confirmed]
    for r in rows:
        a, c = r.part_a, r.part_b
        cn = r.common_neighbors
        assert r.cn_capped <= cn  # capped census is a lower bound
        jac = cn / (len(nbrs[a]) + len(nbrs[c]) - cn)
        aa = sum(1.0 / math.log(len(nbrs[w])) for w in nbrs[a] & nbrs[c])
        assert math.isclose(r.jaccard, jac, abs_tol=1e-5)
        assert math.isclose(r.adamic_adar, aa, abs_tol=1e-4)
