"""Invariant + reference-recompute tests for wave 16 (eval_ops):
contamination census, Matryoshka prefix quality, int8 quantization
error, retrieval metrics. Each query is recomputed independently in
pure Python/numpy at smoke scale and checked against the Spark result.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def _docs(spark, sf):
    return (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )


def _emb(spark, sf):
    df = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in df.embedding])
    return df.vec_id.to_numpy(), df.label.to_numpy(), mat


def _is_test(doc_id: int) -> bool:
    h = hashlib.sha256(f"split:{doc_id}".encode()).hexdigest()
    return int(h[:6], 16) % 100 < 10


def test_contamination_matches_pure_python(spark):
    row = (
        REGISTRY["contamination_ngram_census"].fn(spark, SF_SMOKE).collect()[0]
    )
    docs = _docs(spark, SF_SMOKE)
    grams = {}
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        g = (
            {text[i : i + 8] for i in range(max(1, len(text) - 7))}
            if len(text) > 0
            else {""}
        )
        grams[did] = g
    train = set()
    for did, g in grams.items():
        if not _is_test(did):
            train |= g
    test_ids = [d for d in grams if _is_test(d)]
    shared = {d: len(grams[d] & train) for d in test_ids}
    contaminated = [d for d in test_ids if shared[d] > 0]
    assert row.n_test_docs == len(test_ids)
    assert row.n_contaminated_docs == len(contaminated)
    assert row.shared_gram_doc_pairs == sum(shared.values())
    assert abs(row.contamination_rate - len(contaminated) / len(test_ids)) < 1e-6


def test_matryoshka_recompute_and_monotonicity(spark):
    out = (
        REGISTRY["matryoshka_prefix_quality"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("prefix_width")
    )
    _, _, mat = _emb(spark, SF_SMOKE)
    full_sq = (mat * mat).sum(axis=1)
    for w in (8, 16, 32):
        frac = ((mat[:, :w] * mat[:, :w]).sum(axis=1) / full_sq).mean()
        assert abs(out.loc[w, "energy_frac_mean"] - frac) < 1e-6, w
    # more dims -> more captured energy, strictly (random dense vectors)
    e = out["energy_frac_mean"]
    assert e.loc[8] < e.loc[16] < e.loc[32] < 1.0
    assert ((out["top1_agreement"] >= 0) & (out["top1_agreement"] <= 1)).all()


def test_matryoshka_top1_agreement_recompute(spark):
    out = (
        REGISTRY["matryoshka_prefix_quality"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("prefix_width")
    )
    ids, _, mat = _emb(spark, SF_SMOKE)
    probes = [i for i, v in enumerate(ids) if v < 20]

    def top1(w):
        sub = mat[:, :w]
        norms = np.sqrt((sub * sub).sum(axis=1))
        res = {}
        for p in probes:
            sims = (sub @ sub[p]) / (norms * norms[p])
            order = sorted(
                (i for i in range(len(ids)) if ids[i] != ids[p]),
                key=lambda i: (-sims[i], ids[i]),
            )
            res[ids[p]] = ids[order[0]]
        return res

    full = top1(64)
    for w in (8, 16, 32):
        pref = top1(w)
        agree = sum(pref[q] == full[q] for q in pref) / len(pref)
        assert abs(out.loc[w, "top1_agreement"] - agree) < 1e-6, w


def test_quant_error_matches_numpy(spark):
    out = (
        REGISTRY["embedding_int8_quant_error"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("label")
    )
    _, labels, mat = _emb(spark, SF_SMOKE)
    scales = np.abs(mat).max(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(scales == 0, 0.0, np.round(mat * 127.0 / scales))
        deq = np.where(scales == 0, 0.0, q * scales / 127.0)
    mse = ((mat - deq) ** 2).sum(axis=1) / mat.shape[1]
    cos = (mat * deq).sum(axis=1) / (
        np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((deq * deq).sum(axis=1))
    )
    ref = pd.DataFrame({"label": labels, "mse": mse, "cos": cos}).groupby("label").mean()
    for lbl in ref.index:
        assert abs(out.loc[lbl, "mse_mean"] - ref.loc[lbl, "mse"]) < 1e-8, lbl
        assert abs(out.loc[lbl, "cosine_mean"] - ref.loc[lbl, "cos"]) < 1e-5, lbl
    # int8 at max-abs scaling keeps cosine essentially intact
    assert (out["cosine_mean"] > 0.999).all()
    assert (out["mse_mean"] >= 0).all()


def test_retrieval_metrics_match_numpy(spark):
    out = (
        REGISTRY["retrieval_metrics_eval"]
        .fn(spark, SF_ORACLE)
        .toPandas()
        .set_index("probe_label")
    )
    ids, labels, mat = _emb(spark, SF_ORACLE)
    norms = np.sqrt((mat * mat).sum(axis=1))
    lbl_cnt = pd.Series(labels).value_counts()
    rows = []
    for p in np.where(ids < 20)[0]:
        sims = (mat @ mat[p]) / (norms * norms[p])
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[p]),
            key=lambda i: (-sims[i], ids[i]),
        )[:10]
        rel = [1 if labels[i] == labels[p] else 0 for i in order]
        dcg = sum(r / math.log2(k + 2) for k, r in enumerate(rel))
        n_rel = min(int(lbl_cnt[labels[p]]) - 1, 10)
        idcg = sum(1 / math.log2(k + 2) for k in range(n_rel))
        first = next((k + 1 for k, r in enumerate(rel) if r), None)
        rows.append(
            {
                "label": labels[p],
                "ndcg": dcg / idcg,
                "rr": 0.0 if first is None else 1.0 / first,
                "p10": sum(rel) / 10,
            }
        )
    ref = pd.DataFrame(rows).groupby("label").mean()
    for lbl in ref.index:
        assert abs(out.loc[lbl, "ndcg_at_10"] - ref.loc[lbl, "ndcg"]) < 1e-5, lbl
        assert abs(out.loc[lbl, "mrr_at_10"] - ref.loc[lbl, "rr"]) < 1e-5, lbl
        assert abs(out.loc[lbl, "precision_at_10"] - ref.loc[lbl, "p10"]) < 1e-6, lbl
    assert ((out["ndcg_at_10"] >= 0) & (out["ndcg_at_10"] <= 1)).all()
    assert (out["mrr_at_10"] <= 1).all()
