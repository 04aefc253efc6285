"""Independent reference-recompute tests for wave 26 (round 7):
BI/lifecycle analytics, corpus-mixing diagnostics, effect sizes, and
the GROUP BY ALL surface — recomputed in pandas/pure Python at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def test_backlog_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .toPandas()
    )
    last = li.groupby("l_orderkey").l_shipdate.max()
    o = o[o.o_orderkey.isin(last.index)]
    open_m = o.o_orderdate.map(lambda d: d.year * 12 + d.month)
    close_m = o.o_orderkey.map(last).map(lambda d: d.year * 12 + d.month)
    opens, closes = Counter(open_m), Counter(close_m)
    rows = REGISTRY["open_order_backlog_monthly"].fn(spark, SF_SMOKE).collect()
    months = sorted(set(opens) | set(closes))
    assert [r.month_index for r in rows] == months
    cum = 0
    for r in rows:
        assert r.n_opened == opens.get(r.month_index, 0)
        assert r.n_closed == closes.get(r.month_index, 0)
        cum += r.n_opened - r.n_closed
        assert r.backlog_at_month_end == cum
    assert rows[-1].backlog_at_month_end == 0  # every order eventually ships


def test_clv_cohort_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    q = o.o_orderdate.map(lambda d: d.year * 4 + (d.month - 1) // 3)
    o = o.assign(q=q)
    first = o.groupby("o_custkey").q.min()
    o = o.assign(cohort=o.o_custkey.map(first))
    o = o.assign(age=o.q - o.cohort)
    o = o[o.age <= 7]
    want = {
        (int(c), int(a)): (
            sub.o_custkey.nunique(),
            round(float(np.round(sub.o_totalprice, 2).sum()), 2),
        )
        for (c, a), sub in o.groupby(["cohort", "age"])
    }
    rows = REGISTRY["clv_cohort_matrix"].fn(spark, SF_SMOKE).collect()
    got = {
        (r.cohort_q, r.age_q): (r.n_active, round(r.revenue, 2)) for r in rows
    }
    assert got == want
    # age-0 diagonal: every cohort has its acquisition quarter populated
    assert all((c, 0) in got for c in {k[0] for k in got})


def test_new_vs_returning_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    m = o.o_orderdate.map(lambda d: d.year * 12 + d.month)
    o = o.assign(m=m, rev=np.round(o.o_totalprice, 2))
    first = o.groupby("o_custkey").m.min()
    o = o.assign(is_new=o.m == o.o_custkey.map(first))
    rows = REGISTRY["new_vs_returning_monthly"].fn(spark, SF_SMOKE).collect()
    for r in rows:
        sub = o[o.m == r.month_index]
        new = sub[sub.is_new]
        assert r.n_new_customers == new.o_custkey.nunique()
        assert math.isclose(r.revenue_new, new.rev.sum(), abs_tol=0.02)
        assert math.isclose(
            r.revenue_returning, sub[~sub.is_new].rev.sum(), abs_tol=0.02
        )
        assert math.isclose(
            r.new_share, new.rev.sum() / sub.rev.sum(), abs_tol=1e-5
        )
    # acquisition burns down: by the last year most revenue is returning
    assert rows[-1].new_share < rows[0].new_share


def test_group_by_all_matches_explicit(spark):
    got = REGISTRY["sql_group_by_all"].fn(spark, SF_SMOKE)
    from ocean_data_pipeline_spark.catalog import register_views

    register_views(spark, SF_SMOKE)
    want = spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders WHERE o_orderdate >= DATE '1995-01-01'
        GROUP BY status, priority ORDER BY status, priority, n_orders, revenue
        """
    )
    assert got.collect() == want.collect()


def test_grouped_bands_match_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    rows = REGISTRY["grouped_percentile_bands"].fn(spark, SF_SMOKE).collect()
    for r in rows:
        pc = np.sort(
            np.round(
                o[o.o_orderpriority == r.priority].o_totalprice.to_numpy()
                * 100
            ).astype(np.int64)
        )
        n = len(pc)
        assert r.n_orders == n
        for p, col in ((10, r.p10), (50, r.p50), (90, r.p90)):
            assert col == pc[math.ceil(p * n / 100) - 1] / 100.0, (r.priority, p)
    assert all(r.p10 <= r.p50 <= r.p90 for r in rows)


def test_cramers_v_matches_numpy(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o = o.assign(year=o.o_orderdate.map(lambda d: str(d.year)))
    pairs = {
        "priority_x_status": ("o_orderpriority", "o_orderstatus"),
        "priority_x_year": ("o_orderpriority", "year"),
        "status_x_year": ("o_orderstatus", "year"),
    }
    rows = {
        r.pair: r for r in REGISTRY["cramers_v_matrix"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(pairs)
    for pair, (ca, cb) in pairs.items():
        tab = o.groupby([ca, cb]).size().unstack(fill_value=0).to_numpy()
        n = tab.sum()
        exp = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
        chi = ((tab - exp) ** 2 / exp).sum()
        v = math.sqrt(chi / (n * min(tab.shape[0] - 1, tab.shape[1] - 1)))
        r = rows[pair]
        assert r.n_orders == n
        assert (r.r_levels, r.c_levels) == tab.shape
        assert math.isclose(r.chi_sq, chi, rel_tol=1e-5, abs_tol=1e-4)
        assert math.isclose(r.cramers_v, v, abs_tol=1e-5)
        assert 0.0 <= r.cramers_v <= 1.0


def test_source_overlap_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    vocab = defaultdict(set)
    for _, d in docs.iterrows():
        t = d.text
        if len(t) >= 8:
            vocab[d.source].update(t[i : i + 8] for i in range(len(t) - 7))
    rows = REGISTRY["source_ngram_overlap"].fn(spark, SF_SMOKE).collect()
    srcs = sorted(vocab)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = vocab[r.source_a], vocab[r.source_b]
        assert r.grams_a == len(a) and r.grams_b == len(b)
        common = len(a & b)
        assert r.grams_common == common
        assert math.isclose(
            r.jaccard, common / len(a | b), abs_tol=1e-6
        )


def test_length_drift_matches_numpy(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    rows = REGISTRY["length_drift_by_source"].fn(spark, SF_SMOKE).collect()
    lengths = docs.n_chars.to_numpy()
    for r in rows:
        mine = np.sort(docs[docs.source == r.source].n_chars.to_numpy())
        rest = np.sort(docs[docs.source != r.source].n_chars.to_numpy())
        assert r.n_source == len(mine) and r.n_rest == len(rest)
        levels = np.unique(lengths)
        cs = np.searchsorted(mine, levels, side="right")
        cr = np.searchsorted(rest, levels, side="right")
        d_num = np.max(
            np.abs(
                cs.astype(np.int64) * len(rest)
                - cr.astype(np.int64) * len(mine)
            )
        )
        assert math.isclose(
            r.d_stat, d_num / (len(mine) * len(rest)), abs_tol=1e-6
        )


def test_mixed_language_margin_matches_python(spark):
    import re

    from ocean_data_pipeline_spark.operators.text import STOPWORDS

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    per_lang = defaultdict(list)
    for _, d in docs.iterrows():
        if not d.text.strip():
            continue
        toks = re.split(r"\s+", d.text.strip().lower())
        hits = sorted(
            sum(t in set(STOPWORDS[lg]) for t in toks)
            for lg in ("en", "de", "fr", "es")
        )
        per_lang[d.lang].append((hits[-1], hits[-2]))
    rows = {
        r.actual_lang: r
        for r in REGISTRY["mixed_language_margin"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(per_lang)
    for lang, pairs in per_lang.items():
        r = rows[lang]
        assert r.n_docs == len(pairs)
        assert r.n_no_signal == sum(1 for t1, _ in pairs if t1 == 0)
        assert r.n_ambiguous == sum(
            1 for t1, t2 in pairs if t1 > 0 and t1 - t2 <= 1
        )
        margins = [(t1 - t2) / t1 for t1, t2 in pairs if t1 > 0]
        if margins:
            assert math.isclose(
                r.mean_rel_margin, sum(margins) / len(margins), abs_tol=1e-5
            )
