"""Independent reference-recompute tests for wave 34 (round 8):
absorbing chain, trend/seasonal strength, information gain,
newsvendor quantile, permutation test — recomputed in numpy/pure
Python at sf0.001 from the same parquet.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def test_absorbing_chain_matches_python(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    trans = {}
    for _, grp in ev.groupby("user_id"):
        states = list(grp.event_type)
        for a, b in zip(states, states[1:]):
            if a != "purchase":
                trans[(a, b)] = trans.get((a, b), 0) + 1
    outs = {}
    for (a, _), c in trans.items():
        outs[a] = outs.get(a, 0) + c
    states = sorted(outs)
    q = {
        (a, b): c / outs[a]
        for (a, b), c in trans.items()
        if b != "purchase"
    }
    p_abs = {
        a: trans.get((a, "purchase"), 0) / outs[a] for a in states
    }
    t = {a: 0.0 for a in states}
    for _ in range(25):
        t_new = {}
        for a in states:
            s = sum(
                round(q[(a, b)] * t[b], 9)
                for b in states
                if (a, b) in q
            )
            t_new[a] = round(1.0 + round(s, 9), 9)
        t = t_new
    got = {
        r.state: r
        for r in REGISTRY["absorbing_chain_steps"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(states)
    for a in states:
        assert got[a].n_transitions == outs[a]
        assert math.isclose(got[a].p_convert_next, p_abs[a], abs_tol=1e-6)
        assert math.isclose(got[a].expected_steps_t25, t[a], abs_tol=5e-4)
        # a funnel with per-step conversion chance has finite expected steps
        assert got[a].expected_steps_t25 >= 1.0


def test_trend_seasonal_strength_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    d = pd.to_datetime(o.o_orderdate)
    g = (
        o.assign(x=np.round(o.o_totalprice, 2), y=d.dt.year, mo=d.dt.month)
        .groupby(["y", "mo"]).x.sum().reset_index().sort_values(["y", "mo"])
    )
    xs = g.x.to_numpy(dtype=np.float64)
    mos = g.mo.to_numpy()
    n = len(xs)
    trend = np.full(n, np.nan)
    for t in range(6, n - 6):
        trend[t] = (xs[t - 5 : t + 7].sum() + xs[t - 6 : t + 6].sum()) / 24
    ok = ~np.isnan(trend)
    detr = xs[ok] - trend[ok]
    mo_ok = mos[ok]
    sidx = {m: detr[mo_ok == m].mean() for m in np.unique(mo_ok)}
    smean = np.mean(list(sidx.values()))
    s = np.array([sidx[m] - smean for m in mo_ok])
    r = detr - s
    f_t = max(0.0, 1 - r.var() / (trend[ok] + r).var())
    f_s = max(0.0, 1 - r.var() / detr.var())
    row = REGISTRY["trend_seasonal_strength"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_used == int(ok.sum())
    assert math.isclose(row.trend_strength, f_t, rel_tol=1e-3, abs_tol=1e-4)
    assert math.isclose(row.seasonal_strength, f_s, rel_tol=1e-3, abs_tol=1e-4)
    assert 0.0 <= row.trend_strength <= 1.0
    assert 0.0 <= row.seasonal_strength <= 1.0


def test_information_gain_matches_python(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    y = (li.l_returnflag == "R").astype(int)
    feats = {
        "l_linestatus": li.l_linestatus.astype(str),
        "ship_quarter": pd.to_datetime(li.l_shipdate).dt.quarter.astype(str),
        "qty_band": (li.l_quantity.astype(np.int64) // 10).astype(str),
    }

    def ent(pos, n):
        if n == 0:
            return 0.0
        h = 0.0
        for c in (pos, n - pos):
            if c > 0:
                p = c / n
                h -= p * math.log(p)
        return h

    n = len(y)
    hy = ent(int(y.sum()), n)
    gains = {}
    for f, v in feats.items():
        hc = 0.0
        for lvl, idx in y.groupby(v):
            hc += len(idx) / n * ent(int(idx.sum()), len(idx))
        gains[f] = hy - hc
    got = {
        r.feature: r
        for r in REGISTRY["information_gain_ranking"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(feats)
    for f in feats:
        assert math.isclose(got[f].label_entropy, hy, abs_tol=1e-6)
        assert math.isclose(got[f].info_gain, gains[f], abs_tol=1e-6), f
        assert got[f].n_levels == feats[f].nunique()
    order = sorted(feats, key=lambda f: (-gains[f], f))
    for rk, f in enumerate(order, 1):
        assert got[f].rank == rk


def test_newsvendor_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    daily = o.groupby("o_orderdate").size().to_numpy()
    daily_sorted = np.sort(daily)
    k = math.ceil(0.9 * len(daily_sorted))
    q90 = int(daily_sorted[k - 1])
    row = REGISTRY["newsvendor_quantile"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_days == len(daily)
    assert math.isclose(row.mean_demand, daily.mean(), rel_tol=1e-6, abs_tol=1e-4)
    assert row.order_up_to_q90 == q90
    assert math.isclose(row.critical_ratio, 0.9, abs_tol=1e-9)
    # the stocking level covers at least 90% of observed days
    assert (daily <= q90).mean() >= 0.9


def test_permutation_matches_python(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev = ev[ev.event_type.isin(["click", "view"])]
    vals = np.round(ev.value.to_numpy(dtype=np.float64), 2)
    g = (ev.event_type == "click").astype(int).to_numpy()
    ids = ev.event_id.to_numpy()
    t_obs = vals[g == 1].mean() - vals[g == 0].mean()
    extreme = 0
    for b in range(1, 201):
        gp = np.array(
            [
                int(
                    hashlib.sha256(f"{i}:{b}".encode()).hexdigest()[:6], 16
                )
                % 2
                for i in ids
            ]
        )
        if gp.sum() == 0 or (1 - gp).sum() == 0:
            continue
        tb = vals[gp == 1].mean() - vals[gp == 0].mean()
        if abs(tb) >= abs(t_obs):
            extreme += 1
    row = REGISTRY["permutation_test_lite"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_click == int(g.sum())
    assert row.n_view == int((1 - g).sum())
    assert math.isclose(row.observed_gap, t_obs, rel_tol=1e-5, abs_tol=1e-5)
    assert row.n_extreme_plus1 == 1 + extreme
    assert math.isclose(row.p_value, (1 + extreme) / 201, abs_tol=1e-6)
    assert 0.0 < row.p_value <= 1.0
