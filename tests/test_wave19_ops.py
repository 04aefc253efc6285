"""Invariant + reference-recompute tests for wave 19: MMR diversified
top-k, monthly periodogram, zone-map pruning audit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_mmr_matches_greedy_numpy(spark):
    out = (
        REGISTRY["mmr_diversified_topk"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("sel_round")
        .reset_index(drop=True)
    )
    df = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    ids = df.vec_id.to_numpy()
    mat = np.array([np.array(v, dtype=np.float64) for v in df.embedding])
    norms = np.sqrt((mat * mat).sum(axis=1))
    qi = int(np.where(ids == 0)[0][0])
    sim_q = (mat @ mat[qi]) / (norms * norms[qi])
    pool = sorted(
        (i for i in range(len(ids)) if ids[i] != 0),
        key=lambda i: (-sim_q[i], ids[i]),
    )[:12]
    lam = 0.7
    sel = [min(pool, key=lambda i: (-sim_q[i], ids[i]))]
    for _ in range(3):
        rem = [i for i in pool if i not in sel]
        best = min(
            rem,
            key=lambda i: (
                -(
                    lam * sim_q[i]
                    - (1 - lam)
                    * max(
                        (mat[i] @ mat[s]) / (norms[i] * norms[s]) for s in sel
                    )
                ),
                ids[i],
            ),
        )
        sel.append(best)
    assert out.vec_id.tolist() == [int(ids[i]) for i in sel]
    # round 1 is the plain top-1; scores are within [-1, 1]
    assert abs(out.loc[0, "mmr_score"] - out.loc[0, "sim_to_query"]) < 1e-9
    assert (out.mmr_score.abs() <= 1.0 + 1e-9).all()
    # diversity penalty never raises the score above pure relevance
    assert (out.mmr_score <= out.sim_to_query + 1e-9).all()


def test_periodogram_matches_numpy(spark):
    out = (
        REGISTRY["periodogram_monthly"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("harmonic")
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
    y = m.to_numpy() - m.to_numpy().mean()
    n = len(y)
    t = np.arange(1, n + 1)
    amps = {}
    for k in range(1, 13):
        c = float((y * np.cos(2 * math.pi * k * t / n)).sum())
        s = float((y * np.sin(2 * math.pi * k * t / n)).sum())
        amps[k] = math.sqrt(c * c + s * s) / n
        assert abs(out.loc[k, "amplitude"] - amps[k]) < 0.05, k
        assert abs(out.loc[k, "period_months"] - n / k) < 0.01
    # power_rank 1 marks the max-amplitude harmonic
    top = max(amps, key=lambda k: (amps[k], -k))
    assert out.loc[top, "power_rank"] == 1
    assert sorted(out.power_rank) == list(range(1, 13))


def test_zonemap_matches_pandas_and_clustering_wins(spark):
    out = (
        REGISTRY["zonemap_pruning_audit"]
        .fn(spark, SF_ORACLE)
        .toPandas()
        .set_index("layout")
    )
    o = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .select("o_orderkey", "o_orderdate")
        .toPandas()
    )
    o["o_orderdate"] = pd.to_datetime(o.o_orderdate)
    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1995-04-01")

    def audit(sort_cols):
        s = o.sort_values(sort_cols).reset_index(drop=True)
        n = len(s)
        # SQL ntile: first (n % k) tiles get ceil(n/k) rows
        k = 32
        base, extra = divmod(n, k)
        sizes = [base + 1] * extra + [base] * (k - extra)
        scanned_files = scanned_rows = match_rows = 0
        pos = 0
        for sz in sizes:
            chunk = s.o_orderdate.iloc[pos : pos + sz]
            pos += sz
            m = int(((chunk >= lo) & (chunk < hi)).sum())
            match_rows += m
            if chunk.max() >= lo and chunk.min() < hi:
                scanned_files += 1
                scanned_rows += sz
        return scanned_files, scanned_rows, match_rows

    for layout, cols in [
        ("insertion", ["o_orderkey"]),
        ("date_clustered", ["o_orderdate", "o_orderkey"]),
    ]:
        fs, rs, mr = audit(cols)
        assert out.loc[layout, "files_scanned"] == fs, layout
        assert out.loc[layout, "rows_scanned"] == rs, layout
        assert out.loc[layout, "matching_rows"] == mr, layout
    # the whole point: clustering prunes, insertion order doesn't
    assert (
        out.loc["date_clustered", "prune_fraction"]
        > out.loc["insertion", "prune_fraction"]
    )
    assert (
        out.loc["date_clustered", "scan_amplification"]
        <= out.loc["insertion", "scan_amplification"]
    )
    # matching rows identical across layouts (layout can't change truth)
    assert (
        out.loc["date_clustered", "matching_rows"]
        == out.loc["insertion", "matching_rows"]
    )
