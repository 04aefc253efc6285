"""Invariant tests for waves 13-14: RMST, Heaps' law, Cochran-Armitage,
audio energy plumbing, DP calibration.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_rmst_matches_pure_python(spark):
    """RMST == area under the step KM curve, recomputed independently."""
    rows = REGISTRY["rmst_survival"].fn(spark, SF_ORACLE).collect()
    ev = (
        table(spark, SF_ORACLE, "events")
        .select("user_id", "ts", "event_type")
        .toPandas()
    )
    t0 = ev.groupby("user_id").ts.min()
    tp = ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    H = 48
    durs = []
    for uid, start in t0.items():
        if uid in tp.index:
            h = math.floor((tp[uid] - start).total_seconds() / 3600)
            durs.append((min(h, H), h < H))
        else:
            durs.append((H, False))
    durs.sort()
    n_risk = len(durs)
    s = 1.0
    by_t = {}
    for t, event in durs:
        by_t.setdefault(t, [0, 0])
        by_t[t][0] += 1
        if event:
            by_t[t][1] += 1
    surv_at = {}
    for t in sorted(by_t):
        leave, d = by_t[t]
        if d > 0:
            s *= 1 - d / n_risk
            surv_at[t] = s
        n_risk -= leave
    # area: 1.0 until the first event time, then step heights
    times = sorted(surv_at)
    area = times[0]
    for i, t in enumerate(times):
        nxt = times[i + 1] if i + 1 < len(times) else H
        area += surv_at[t] * (nxt - t)
    final = rows[-1]
    assert abs(final.rmst_through_h - area) < 1e-3, (final.rmst_through_h, area)
    hz = [r.rmst_through_h for r in rows]
    assert hz == sorted(hz)
    sv = [r.survival_after for r in rows]
    assert sv == sorted(sv, reverse=True)
    assert 0 <= final.rmst_through_h <= 48


def test_heaps_fit_is_sublinear(spark):
    r = REGISTRY["heaps_law_fit"].fn(spark, SF_ORACLE).collect()[0]
    assert 0.0 < r.heaps_beta < 1.0, "vocabulary growth must be sublinear"
    assert r.heaps_k > 0
    assert r.vocab <= r.total_tokens


def test_cochran_armitage_matches_python(spark):
    r = REGISTRY["cochran_armitage_trend"].fn(spark, SF_ORACLE).collect()[0]
    li = (
        table(spark, SF_ORACLE, "lineitem")
        .select("l_discount", "l_returnflag")
        .toPandas()
    )
    w = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    y = (li.l_returnflag == "R").to_numpy().astype(np.int64)
    N, R = len(w), int(y.sum())
    num = N * int((w * y).sum()) - R * int(w.sum())
    var_core = N * int((w * w).sum()) - int(w.sum()) ** 2
    z2 = num * num * N / (R * (N - R) * var_core)
    assert r.n == N and r.n_positive == R
    assert abs(r.z_squared - z2) < 1e-9 * max(1.0, z2)


def test_audio_energy_matches_generator(spark):
    rows = REGISTRY["audio_energy_census"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows[:10]:
        n = 256 + (r.doc_id % 7) * 64
        s = np.array(
            [(r.doc_id * 3 + k * 31) % 251 for k in range(n)], dtype=np.int64
        )
        assert r.n_samples == n
        assert r.peak == int(s.max())
        assert abs(r.mean_level - s.mean()) < 1e-9
        assert abs(r.rms_level - math.sqrt((s * s).mean())) < 1e-9


def test_audio_energy_malformed_payload_isolated(spark):
    """A corrupted payload must contribute zero rows, not fail the job."""
    from ocean_data_pipeline_spark.operators.multimodal import (
        audio_energy,
        synth_raw_audio,
    )

    good = synth_raw_audio(7)
    bad_magic = b"XXXX" + good[4:]
    truncated = good[: len(good) // 2]
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad_magic)), (3, bytearray(truncated))],
        "doc_id long, payload binary",
    )
    out = audio_energy(df).collect()
    assert [r.doc_id for r in out] == [1]


def test_dp_calibration_scales(spark):
    rows = REGISTRY["dp_noise_calibration"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 15  # 5 priorities x 3 epsilons
    for r in rows:
        assert abs(r.count_laplace_scale - 1.0 / r.epsilon) < 1e-12
        assert abs(r.sum_laplace_scale - 100000.0 / r.epsilon) < 1e-9
        assert r.sum_expected_rel_error > 0
    # privacy-utility monotonicity: bigger epsilon, smaller scale
    by_p = {}
    for r in rows:
        by_p.setdefault(r.priority, []).append((r.epsilon, r.sum_laplace_scale))
    for p, es in by_p.items():
        es.sort()
        scales = [s for _, s in es]
        assert scales == sorted(scales, reverse=True)


def test_ipf_margins_converge(spark):
    """After 6 rounds both margins match the uniform targets to <1e-3."""
    rows = REGISTRY["ipf_survey_raking"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 25
    total = sum(r.n for r in rows)
    target = total / 5.0
    seg = {}
    reg = {}
    for r in rows:
        seg[r.seg] = seg.get(r.seg, 0.0) + r.raked_weight
        reg[r.region] = reg.get(r.region, 0.0) + r.raked_weight
        assert r.raked_weight > 0
    for v in reg.values():  # column pass ran last -> exact-ish
        assert abs(v - target) < 1e-3 * target
    for v in seg.values():  # row margins converge, slightly looser
        assert abs(v - target) < 2e-2 * target


def test_watermark_census_monotone(spark):
    rows = REGISTRY["watermark_design_census"].fn(spark, SF_ORACLE).collect()
    assert [r.w_hours for r in rows] == [1, 6, 24]
    drops = [r.n_dropped_late for r in rows]
    states = [r.final_state_rows for r in rows]
    assert drops == sorted(drops, reverse=True), "longer delay drops less"
    assert states == sorted(states), "longer delay holds more state"
    for r in rows:
        assert 0 <= r.n_dropped_late <= r.n_events
        assert abs(r.dropped_share - r.n_dropped_late / r.n_events) < 1e-12


def test_mh_or_within_stratum_envelope(spark):
    """The pooled MH odds ratio must lie inside the per-stratum OR
    envelope (it is a weighted average of stratum ORs)."""
    r = REGISTRY["mantel_haenszel_or"].fn(spark, SF_ORACLE).collect()[0]
    orders = (
        table(spark, SF_ORACLE, "orders")
        .join(
            table(spark, SF_ORACLE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_totalprice", "o_orderstatus")
        .toPandas()
    )
    orders["e"] = orders.o_totalprice > 200000
    orders["y"] = orders.o_orderstatus == "F"
    ors = []
    for seg, g in orders.groupby("c_mktsegment"):
        a = int((g.e & g.y).sum())
        b = int((g.e & ~g.y).sum())
        c = int((~g.e & g.y).sum())
        d = int((~g.e & ~g.y).sum())
        if b * c > 0 and a * d > 0:
            ors.append((a * d) / (b * c))
    assert ors
    assert min(ors) - 1e-9 <= r.mh_odds_ratio <= max(ors) + 1e-9
    assert r.crude_odds_ratio > 0


def test_logrank_aa_split_is_null(spark):
    """A sha A/A split carries no real effect: chi2 should be small
    (P(chi2_1 > 11) < 0.001 — a deterministic one-off draw)."""
    r = REGISTRY["logrank_test"].fn(spark, SF_ORACLE).collect()[0]
    assert r.variance > 0
    assert r.logrank_chi2 < 11.0, r.logrank_chi2
    assert abs(r.n_group1 + r.n_group0 - (
        table(spark, SF_ORACLE, "events").select("user_id").distinct().count()
    )) == 0


def test_kendall_tau_matches_numpy(spark):
    r = REGISTRY["kendall_tau_b"].fn(spark, SF_SMOKE).collect()[0]
    li = (
        table(spark, SF_SMOKE, "lineitem")
        .select("l_quantity", "l_discount")
        .toPandas()
    )
    q = np.round(li.l_quantity.to_numpy()).astype(np.int64)
    d = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    n = len(q)
    # O(n^2) reference on the small scale
    conc = disc = 0
    for i in range(n):
        dq = q[i + 1 :] - q[i]
        dd = d[i + 1 :] - d[i]
        s = np.sign(dq) * np.sign(dd)
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    assert r.concordant == conc and r.discordant == disc
    n0 = n * (n - 1) / 2
    tx = sum(c * (c - 1) / 2 for c in np.bincount(q) if c > 1)
    ty = sum(c * (c - 1) / 2 for c in np.bincount(d) if c > 1)
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(r.tau_b - tau) < 1e-12
    # same monotone direction as Spearman
    rs = REGISTRY["spearman_rank_correlation"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.tau_b >= 0) == (rs.rho_spearman >= 0)
