"""Independent reference-recompute tests for wave 33 (round 8):
kNN label noise, 1-bit quantization, pass@k, Bradley-Terry, ECE,
chunk-overlap census — recomputed in numpy/pure Python at sf0.001.
"""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _emb(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    vecs = np.vstack(e.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    return e.vec_id.to_numpy(), vecs, e.label.to_numpy()


def test_knn_label_noise_matches_numpy(spark):
    ids, vecs, labels = _emb(spark)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    flagged = {}
    for p in range(len(ids)):
        if ids[p] >= 100:
            continue
        sims = (vecs @ vecs[p]) / (norms * norms[p])
        order = sorted(
            ((-sims[i], ids[i], i) for i in range(len(ids)) if ids[i] != ids[p])
        )[:3]
        agree = sum(labels[i] == labels[p] for _, _, i in order)
        flagged.setdefault(labels[p], []).append(agree)
    got = {
        r.label: r
        for r in REGISTRY["knn_label_noise_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(flagged)
    for lab, agrees in flagged.items():
        r = got[lab]
        assert r.n_probes == len(agrees)
        assert r.n_flagged == sum(a <= 1 for a in agrees)
        assert math.isclose(
            r.mean_nbr_agreement,
            sum(agrees) / (3 * len(agrees)),
            abs_tol=1e-6,  # engine output is rounded to 6 dp
        )


def test_binary_quant_matches_numpy(spark):
    ids, vecs, _ = _emb(spark)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    signs = vecs >= 0
    cos_l, est_l = [], []
    hams = []
    for a in range(len(ids)):
        if ids[a] >= 50:
            continue
        for b in range(len(ids)):
            if ids[b] <= ids[a]:
                continue
            cos = float(vecs[a] @ vecs[b] / (norms[a] * norms[b]))
            ham = int((signs[a] != signs[b]).sum())
            cos_l.append(cos)
            est_l.append(math.cos(math.pi * ham / 64))
            hams.append(ham)
    cos_a, est_a = np.array(cos_l), np.array(est_l)
    corr = float(np.corrcoef(cos_a, est_a)[0, 1])
    row = REGISTRY["binary_embedding_quant"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_pairs == len(cos_l)
    assert math.isclose(row.cos_est_corr, corr, rel_tol=1e-4, abs_tol=1e-5)
    assert math.isclose(
        row.mean_abs_err, float(np.abs(cos_a - est_a).mean()), rel_tol=1e-5
    )
    assert math.isclose(
        row.mean_hamming, float(np.mean(hams)), rel_tol=1e-6, abs_tol=1e-4
    )
    # sign bits must carry real signal on random-ish embeddings
    assert row.cos_est_corr > 0.5


def test_pass_at_k_matches_comb(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    g = ev.assign(s=(ev.value >= 10.0).astype(int)).groupby("user_id").agg(
        n=("s", "size"), c=("s", "sum")
    )
    got = {
        r.k: r for r in REGISTRY["pass_at_k_estimator"].fn(spark, SF_SMOKE).collect()
    }
    for k in (1, 5, 10):
        vals = []
        for _, r in g.iterrows():
            n, c = int(r.n), int(r.c)
            if n < k:
                continue
            if n - c < k:
                vals.append(1.0)
            else:
                vals.append(1.0 - math.comb(n - c, k) / math.comb(n, k))
        if not vals:
            assert k not in got
            continue
        assert got[k].n_tasks == len(vals)
        assert math.isclose(
            got[k].mean_pass_at_k, sum(vals) / len(vals), rel_tol=1e-5
        )
    # monotone in k
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[b].mean_pass_at_k >= got[a].mean_pass_at_k - 1e-9


def test_bradley_terry_matches_python(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    n = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").toPandas()
    o = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey",
                right_on="c_custkey")
    o = o.merge(n[["n_nationkey", "n_name"]], left_on="c_nationkey",
                right_on="n_nationkey")
    d = pd.to_datetime(o.o_orderdate)
    o["ym"] = d.dt.year * 100 + d.dt.month
    rev = (
        o.assign(x=np.round(o.o_totalprice, 2))
        .groupby(["n_name", "ym"]).x.sum().reset_index()
    )
    tot = rev.groupby("n_name").x.sum().sort_values(ascending=False)
    ordered = sorted(tot.index, key=lambda s: (-tot[s], s))
    top = ordered[:8]
    months = sorted(rev.ym.unique())
    val = {(r.n_name, r.ym): float(r.x) for r in rev.itertuples()}
    wins = {t: 0 for t in top}
    n_ij = {}
    w_ij = {}
    for ym in months:
        for a, b in combinations(top, 2):
            xa, xb = val.get((a, ym), 0.0), val.get((b, ym), 0.0)
            n_ij[(a, b)] = n_ij.get((a, b), 0) + 1
            n_ij[(b, a)] = n_ij.get((b, a), 0) + 1
            winner = a if (xa, a) > (xb, b) else b
            wins[winner] += 1
            w_ij[(winner, a if winner == b else b)] = 0  # unused; totals only
    pi = {t: 1.0 for t in top}
    for _ in range(3):
        raw = {}
        for i in top:
            denom = sum(
                n_ij[(i, j)] / (pi[i] + pi[j]) for j in top if j != i
            )
            raw[i] = wins[i] / denom
        s = sum(raw.values())
        pi = {i: raw[i] * 8 / s for i in top}
    got = {
        r.nation: r
        for r in REGISTRY["bradley_terry_nations"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(top)
    for t in top:
        assert got[t].wins == wins[t], t
        assert math.isclose(got[t].bt_strength, pi[t], rel_tol=1e-4), t
    # ranks consistent with strengths
    order = sorted(top, key=lambda t: (-pi[t], t))
    for rk, t in enumerate(order, 1):
        assert got[t].bt_rank == rk


def test_ece_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    conf = 1.0 / (1.0 + np.exp(-(np.round(o.o_totalprice, 2) / 100000 - 1.5)))
    y = (o.o_orderstatus == "F").astype(float).to_numpy()
    bins = np.minimum(9, np.floor(conf * 10).astype(int))
    n = len(conf)
    ece = 0.0
    max_gap = 0.0
    for b in range(10):
        m = bins == b
        if not m.any():
            continue
        gap = abs(y[m].mean() - conf[m].mean())
        ece += m.sum() / n * gap
        max_gap = max(max_gap, gap)
    row = REGISTRY["ece_reliability_bins"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == n
    assert math.isclose(row.base_rate, y.mean(), rel_tol=1e-5)
    assert math.isclose(row.mean_conf, conf.mean(), rel_tol=1e-5)
    assert math.isclose(row.ece, ece, rel_tol=1e-4, abs_tol=1e-6)
    assert math.isclose(row.max_bin_gap, max_gap, rel_tol=1e-4, abs_tol=1e-6)
    assert math.isclose(row.brier, float(((conf - y) ** 2).mean()), rel_tol=1e-5)


def test_chunk_overlap_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    per_source = {}
    for _, r in docs.iterrows():
        nt = len(r.text.strip().lower().split())
        starts = list(range(0, max(nt - 1, 0) + 1, 48))
        ct = sum(min(64, nt - s) for s in starts)
        d = per_source.setdefault(r.source, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(starts)
        d[2] += nt
        d[3] += ct
    got = {
        r.source: r
        for r in REGISTRY["chunk_overlap_census"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per_source)
    for s, (nd, nc, dt, ct) in per_source.items():
        r = got[s]
        assert (r.n_docs, r.n_chunks, r.doc_tokens, r.chunk_tokens) == (
            nd, nc, dt, ct,
        ), s
        assert math.isclose(
            r.duplication_rate, (ct - dt) / ct, abs_tol=1e-6  # 6-dp output
        ), s
        assert 0.0 <= r.duplication_rate < 0.3
