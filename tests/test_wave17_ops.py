"""Invariant + reference-recompute tests for wave 17: Kruskal-Wallis,
BH-FDR proportion family, Theil-Sen trend, Holt linear smoothing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_kruskal_wallis_matches_numpy(spark):
    row = REGISTRY["kruskal_wallis_event_values"].fn(spark, SF_SMOKE).collect()[0]
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "value")
        .toPandas()
        .dropna(subset=["value"])
    )
    v = ev.value.round(6)  # decimal(18,6) cast
    ranks = v.rank(method="average")
    n = len(v)
    groups = ev.assign(r=ranks).groupby("event_type").r.agg(["sum", "count"])
    h = 12.0 / (n * (n + 1)) * float((groups["sum"] ** 2 / groups["count"]).sum()) - 3 * (
        n + 1
    )
    t = v.value_counts().to_numpy(dtype=np.float64)
    c = 1.0 - float((t**3 - t).sum()) / (n**3 - n)
    assert row.n_total == n
    assert row.n_groups == len(groups)
    assert abs(row.h_stat - h) < 1e-4
    assert abs(row.tie_correction - c) < 1e-9
    assert abs(row.h_adj - h / c) < 1e-4
    assert row.h_adj >= row.h_stat > 0  # ties only inflate H


def _phi_tail_exact(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2))


def test_bh_fdr_matches_reference(spark):
    out = REGISTRY["bh_fdr_segment_tests"].fn(spark, SF_ORACLE).toPandas()
    cust = (
        spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .select("c_mktsegment", "c_acctbal")
        .toPandas()
    )
    g = cust.groupby("c_mktsegment").c_acctbal.agg(
        n="count", neg=lambda s: int((s < 0).sum())
    )
    p0 = g.neg.sum() / g.n.sum()
    z = (g.neg / g.n - p0) / np.sqrt(p0 * (1 - p0) / g.n)
    # A&S 26.2.17 is within 7.5e-8 of the exact tail
    p_exact = {s: 2 * _phi_tail_exact(abs(zv)) for s, zv in z.items()}
    out = out.set_index("segment")
    for s in p_exact:
        assert abs(out.loc[s, "p_value"] - p_exact[s]) < 2e-7, s
        assert abs(out.loc[s, "z_score"] - z[s]) < 1e-6, s
    # BH recompute from the query's own p-values
    m = len(out)
    ps = out["p_value"].sort_values()
    q_raw = ps * m / np.arange(1, m + 1)
    q_ref = np.minimum(np.minimum.accumulate(q_raw[::-1])[::-1], 1.0)
    for s, qv in zip(ps.index, q_ref):
        assert abs(out.loc[s, "bh_q_value"] - qv) < 1e-6, s
    # q-values are monotone in p and never below p
    merged = out.sort_values("p_value")
    assert (merged.bh_q_value.diff().dropna() >= -1e-12).all()
    assert (merged.bh_q_value >= merged.p_value - 1e-12).all()


def test_theil_sen_matches_numpy(spark):
    row = REGISTRY["theil_sen_monthly_trend"].fn(spark, SF_SMOKE).collect()[0]
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .toPandas()
    )
    o["idx"] = o.o_orderdate.map(lambda d: d.year * 12 + d.month)
    m = o.groupby("idx").o_totalprice.apply(
        lambda s: float(sum(round(v, 2) for v in s))
    )
    idx = m.index.to_numpy()
    rev = m.to_numpy()
    slopes = [
        (rev[j] - rev[i]) / (idx[j] - idx[i])
        for i in range(len(idx))
        for j in range(i + 1, len(idx))
    ]
    slopes.sort()
    n = len(slopes)
    med = (slopes[(n + 1) // 2 - 1] + slopes[n // 2]) / 2
    assert row.n_months == len(idx)
    assert row.n_pairs == n == len(idx) * (len(idx) - 1) // 2
    assert abs(row.ts_slope - med) < 1e-2
    assert row.min_slope <= row.ts_slope <= row.max_slope


def test_holt_matches_pure_python(spark):
    out = (
        REGISTRY["holt_linear_smoothing"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    a, b = 0.5, 0.3
    lvl = trd = None
    for i, r in out.iterrows():
        y = r.revenue
        if i == 0:
            lvl, trd = y, 0.0
        else:
            l_new = a * y + (1 - a) * (lvl + trd)
            trd = b * (l_new - lvl) + (1 - b) * trd
            lvl = l_new
        assert abs(r.level - lvl) < 1e-2, i
        assert abs(r.trend - trd) < 1e-2, i
        assert abs(r.forecast_next - (lvl + trd)) < 1e-2, i
    # smoothing: level variance <= raw variance
    assert out.level.var() <= out.revenue.var()
