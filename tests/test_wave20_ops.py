"""Invariant + reference-recompute tests for wave 20: PACF via
Durbin-Levinson, embedding isotropy audit.
"""

from __future__ import annotations

import numpy as np

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

REGISTRY = load_all()


def test_pacf_matches_numpy(spark):
    out = (
        REGISTRY["pacf_durbin_levinson"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("lag")
    )
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .toPandas()
    )
    o["t"] = o.o_orderdate.map(lambda d: d.year * 12 + d.month)
    m = (
        o.groupby("t")
        .o_totalprice.apply(lambda s: float(sum(round(v, 2) for v in s)))
        .sort_index()
    )
    y = m.to_numpy()
    n = len(y)
    mu = y.mean()
    c0 = float(((y - mu) ** 2).sum())
    r = {}
    for k in (1, 2, 3):
        r[k] = float(((y[:-k] - mu) * (y[k:] - mu)).sum()) / c0
        assert abs(out.loc[k, "acf"] - r[k]) < 1e-6, k
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r[3] - phi21 * r[2] - phi22 * r[1]) / (
        1 - phi21 * r[1] - phi22 * r[2]
    )
    assert abs(out.loc[1, "pacf"] - phi11) < 1e-6
    assert abs(out.loc[2, "pacf"] - phi22) < 1e-6
    assert abs(out.loc[3, "pacf"] - phi33) < 1e-6
    assert abs(out.loc[1, "conf_band"] - 1.96 / np.sqrt(n)) < 1e-6
    # PACF lag 1 equals ACF lag 1 by construction
    assert abs(out.loc[1, "pacf"] - out.loc[1, "acf"]) < 1e-9


def test_isotropy_matches_numpy(spark):
    row = (
        REGISTRY["embedding_isotropy_audit"].fn(spark, SF_ORACLE).collect()[0]
    )
    df = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in df.embedding])
    n = mat.shape[0]
    mu = mat.mean(axis=0)
    cov = (mat.T @ mat) / n - np.outer(mu, mu)
    var = np.diag(cov)
    trace = float(var.sum())
    off = cov - np.diag(var)
    off_frob2 = float((off**2).sum())
    diag_frob2 = float((var**2).sum())
    corr = cov / np.sqrt(np.outer(var, var))
    mask = ~np.eye(64, dtype=bool)
    mean_abs = float(np.abs(corr[mask]).mean())
    assert row.n_vectors == n
    assert row.dims == 64
    assert abs(row.total_variance - trace) < 1e-4
    assert abs(row.max_dim_var_share - var.max() / trace) < 1e-6
    assert abs(row.offdiag_frob_share - off_frob2 / (off_frob2 + diag_frob2)) < 1e-6
    assert abs(row.mean_abs_corr_offdiag - mean_abs) < 1e-6
    # top pair really is the argmax |corr| (ties broken by (i,j))
    am = np.unravel_index(np.abs(np.where(mask, corr, 0)).argmax(), corr.shape)
    assert {row.top_corr_i - 1, row.top_corr_j - 1} == set(am)
    assert abs(abs(row.top_corr) - abs(corr[am])) < 1e-6
    # sanity: a random synthetic cloud is near-isotropic
    assert row.max_dim_var_share < 0.10
    assert row.mean_abs_corr_offdiag < 0.25
