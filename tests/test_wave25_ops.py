"""Independent reference-recompute tests for wave 25 (round 7): every
statistic recomputed in numpy/pure Python from the raw parquet at
sf0.001 and compared against the engine output — the third leg beside
the DuckDB oracle parity (which shares the SQL formulation) and the
plan gates."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _monthly_revenue_cents(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.round(o.o_totalprice.to_numpy(dtype=np.float64) * 100).astype(
        np.int64
    )
    key = o.o_orderdate.map(lambda d: d.year * 12 + d.month).to_numpy()
    series = defaultdict(int)
    for k, c in zip(key, cents):
        series[int(k)] += int(c)
    return series  # month-index -> revenue in cents


def test_ljung_box_matches_numpy(spark):
    series = _monthly_revenue_cents(spark)
    ts = sorted(series)
    x = np.array([series[t] for t in ts], dtype=np.float64) / 100.0
    n = len(x)
    mu = x.mean()
    den = np.sum(x * x) - n * mu * mu
    q = 0.0
    for k in range(1, 7):
        pairs = [(series[t] / 100.0, series[t + k] / 100.0)
                 for t in ts if t + k in series]
        a = np.array([p[0] for p in pairs])
        b = np.array([p[1] for p in pairs])
        r = (np.sum(a * b) - mu * a.sum() - mu * b.sum()
             + len(pairs) * mu * mu) / den
        q += r * r / (n - k)
    q *= n * (n + 2)
    row = REGISTRY["ljung_box_monthly"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_months == n and row.df == 6
    assert math.isclose(row.q_stat, q, rel_tol=1e-6)
    p = math.exp(-q / 2) * (1 + q / 2 + q * q / 8)
    assert math.isclose(row.p_value, p, rel_tol=1e-6, abs_tol=1e-9)


def test_jarque_bera_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = np.round(o.o_totalprice.to_numpy(dtype=np.float64) * 100)
    n = len(c)
    m1 = c.mean()
    m2 = (c * c).mean() - m1 * m1
    m3 = (c**3).mean() - 3 * m1 * (c * c).mean() + 2 * m1**3
    m4 = (
        (c**4).mean()
        - 4 * m1 * (c**3).mean()
        + 6 * m1 * m1 * (c * c).mean()
        - 3 * m1**4
    )
    s = m3 / (m2 * math.sqrt(m2))
    k = m4 / (m2 * m2) - 3
    jb = n / 6.0 * (s * s + k * k / 4)
    row = REGISTRY["jarque_bera_price"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_orders == n
    assert math.isclose(row.skewness, s, rel_tol=1e-6)
    assert math.isclose(row.excess_kurtosis, k, rel_tol=1e-6)
    assert math.isclose(row.jb_stat, jb, rel_tol=1e-5)
    assert math.isclose(
        row.p_value, math.exp(-jb / 2), rel_tol=1e-5, abs_tol=1e-9
    )


def test_brown_forsythe_matches_numpy(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev = ev[ev.value.notna()]
    groups = {}
    for g, sub in ev.groupby("event_type"):
        v = np.sort(np.round(sub.value.to_numpy(dtype=np.float64), 6))
        med = v[math.ceil(len(v) / 2) - 1]  # exact lower median
        groups[g] = np.abs(v - med)
    k = len(groups)
    n = sum(len(z) for z in groups.values())
    zbar = sum(z.sum() for z in groups.values()) / n
    ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in groups.values())
    ssw = sum(((z - z.mean()) ** 2).sum() for z in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = (
        REGISTRY["brown_forsythe_event_values"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert row.n_groups == k and row.n_values == n
    assert math.isclose(row.f_stat, f, rel_tol=1e-4)


def test_hits_matches_pandas(spark):
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    a1 = li.groupby("l_partkey").size()
    h1 = li.assign(a=li.l_partkey.map(a1)).groupby("l_orderkey").a.sum()
    a2 = li.assign(h=li.l_orderkey.map(h1)).groupby("l_partkey").h.sum()
    mx = a2.max()
    top = sorted(
        ((int(v), int(p)) for p, v in a2.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    rows = REGISTRY["hits_bipartite_authorities"].fn(spark, SF_SMOKE).collect()
    assert [(r.authority_raw, r.partkey) for r in rows] == top
    for r in rows:
        assert math.isclose(
            r.authority_score, round(r.authority_raw / mx, 10), abs_tol=1e-12
        )


def test_cutpoints_match_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    pc = np.sort(
        np.round(o.o_totalprice.to_numpy(dtype=np.float64) * 100).astype(
            np.int64
        )
    )
    n = len(pc)
    row = REGISTRY["exact_percentile_cutpoints"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_orders == n
    for p in (1, 5, 25, 50, 75, 95, 99):
        want = pc[math.ceil(p * n / 100) - 1] / 100.0
        assert getattr(row, f"p{p:02d}") == want, p


def test_doc_repetition_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    per_source = defaultdict(list)
    for _, d in docs.iterrows():
        toks = re.split(r"\s+", d.text.strip().lower())
        if d.text.strip() == "" or len(toks) < 3:
            continue
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        per_source[d.source].append(1.0 - len(set(grams)) / len(grams))
    rows = {
        r.source: r
        for r in REGISTRY["doc_repetition_census"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(per_source)
    for src, reps in per_source.items():
        r = rows[src]
        assert r.n_docs == len(reps)
        assert math.isclose(
            r.mean_rep_ratio, sum(reps) / len(reps), abs_tol=1e-5
        )
        assert math.isclose(r.max_rep_ratio, max(reps), abs_tol=1e-8)
        assert r.n_repetitive == sum(1 for x in reps if x > 0.1)


def test_seasonal_mk_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    cents = np.round(o.o_totalprice.to_numpy(dtype=np.float64) * 100).astype(
        np.int64
    )
    series = defaultdict(int)
    for d, c in zip(o.o_orderdate, cents):
        series[(d.year, d.month)] += int(c)
    s_tot, var_s, n_seasons = 0, 0.0, 0
    for mo in range(1, 13):
        ys = sorted(y for (y, m) in series if m == mo)
        if len(ys) < 2:
            if ys:
                n_seasons += 1
                var_s += len(ys) * (len(ys) - 1) * (2 * len(ys) + 5) / 18
            continue
        n_seasons += 1
        xs = [series[(y, mo)] for y in ys]
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                s_tot += (xs[j] > xs[i]) - (xs[j] < xs[i])
        nm = len(xs)
        var_s += nm * (nm - 1) * (2 * nm + 5) / 18
    row = REGISTRY["seasonal_mann_kendall"].fn(spark, SF_SMOKE).collect()[0]
    assert row.s_total == s_tot
    assert math.isclose(row.var_s, var_s, rel_tol=1e-9)
    z = (
        (s_tot - 1) / math.sqrt(var_s)
        if s_tot > 0
        else (s_tot + 1) / math.sqrt(var_s)
        if s_tot < 0
        else 0.0
    )
    assert math.isclose(row.z_score, z, abs_tol=1e-6)


def test_dedup_savings_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    sizes = Counter()
    chars = {}
    for _, d in docs.iterrows():
        h = hashlib.sha256(d.text.encode()).hexdigest()
        sizes[h] += 1
        chars[h] = int(d.n_chars)
    by_k = defaultdict(lambda: [0, 0, 0])
    for h, k in sizes.items():
        row = by_k[k]
        row[0] += 1
        row[1] += k - 1
        row[2] += (k - 1) * chars[h]
    rows = REGISTRY["dedup_savings_census"].fn(spark, SF_SMOKE).collect()
    got = {
        r.cluster_size: (r.n_clusters, r.docs_removable, r.chars_removable)
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in by_k.items()}
    # conservation: removable docs + unique clusters == corpus size
    assert sum(r.n_clusters * r.cluster_size for r in rows) == len(docs)


def test_embedding_norms_match_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in emb.embedding]
    )
    ssq = np.round(vecs * vecs * 1e12).sum(axis=1)
    norms = np.sqrt(ssq / 1e12)
    row = REGISTRY["embedding_norm_audit"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_vectors == len(norms)
    assert math.isclose(row.mean_norm, norms.mean(), abs_tol=1e-5)
    assert math.isclose(row.min_norm, norms.min(), abs_tol=1e-8)
    assert math.isclose(row.max_norm, norms.max(), abs_tol=1e-8)
    assert row.n_near_zero == int((norms < 0.1).sum())
    assert row.n_unit_band == int((np.abs(norms - 1.0) <= 0.05).sum())
