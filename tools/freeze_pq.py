"""Regenerate the frozen product-quantization codebooks
(ocean_data_pipeline_spark/operators/pq_codebook.py).

Trains one k-means codebook per 8-dim subspace (M=8 subspaces x
K=16 centroids over the 64-dim embeddings) with a deterministic
numpy Lloyd iteration (seed 42, 25 rounds, farthest-point reseed
for empty cells) on the sf0.01 embeddings table, then rewrites the
module with the sub-centroids as full-repr literals. Run ONLY when
the embeddings testdata changes — the committed codebooks are a
build artifact, and churning them invalidates the sim_topk_pq
oracle history for no reason.

Usage: python tools/freeze_pq.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M_SUBSPACES = 8
K_CODES = 16
N_ITERS = 25
SEED = 42
OUT = os.path.join(REPO, "ocean_data_pipeline_spark", "operators", "pq_codebook.py")

HEADER = '''"""Frozen product-quantization codebooks (SURVEY.md §2-K
sim-search, scale path).

M=8 subspaces x K=16 centroids x 8 dims, trained ONCE per subspace
(numpy Lloyd, seed 42) on the sf0.01 embeddings table and committed
as literals. PQ encodes a 64-dim float vector as 8 nibble codes
(64 bits vs 256 bytes float32 = 32x compression) — at 100 TB the
encoded corpus fits where the raw vectors never would, and the
asymmetric-distance scan reads 8 bytes/candidate instead of 256.
Freezing the codebooks makes encode + ADC deterministic across
engines, so sim_topk_pq carries a DuckDB oracle (the literals are
inlined into the SQL).

Regenerate (only if the embeddings testdata changes):
    python tools/freeze_pq.py
"""
'''


def lloyd(x: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Deterministic Lloyd k-means; empty cells reseeded to the point
    farthest from its assigned centroid."""
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members) == 0:
                worst = d2[np.arange(len(x)), assign].argmax()
                cents[c] = x[worst]
            else:
                cents[c] = members.mean(axis=0)
    return cents


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    n, dim = x.shape
    assert dim % M_SUBSPACES == 0, (dim, M_SUBSPACES)
    sub = dim // M_SUBSPACES
    rng = np.random.default_rng(SEED)
    books = [
        lloyd(x[:, m * sub : (m + 1) * sub], K_CODES, N_ITERS, rng)
        for m in range(M_SUBSPACES)
    ]

    lines = [HEADER]
    lines.append(f"PQ_M = {M_SUBSPACES}")
    lines.append(f"PQ_K = {K_CODES}")
    lines.append(f"PQ_SUBDIM = {sub}")
    lines.append("")
    lines.append("#: PQ_CODEBOOKS[m][code] == sub-centroid; full-repr exact doubles.")
    lines.append("PQ_CODEBOOKS: list[list[list[float]]] = [")
    for book in books:
        lines.append("    [")
        for c in book:
            lines.append(
                "        [" + ", ".join(repr(float(v)) for v in c) + "],"
            )
        lines.append("    ],")
    lines.append("]")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: trained on {n} x {dim} (M={M_SUBSPACES}, K={K_CODES})")


if __name__ == "__main__":
    main()
