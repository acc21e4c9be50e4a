"""Embedding-matrix moment statistics — the production path for
covariance-spectrum diagnostics (X671, the scale twin of the gate-pinned
q_embedding_rank explode form).

One `mapInPandas` pass emits a (D×D sum-of-products matrix, D sum
vector, count) PARTIAL per Arrow batch — a numpy `X.T @ X` each, the
textbook single-pass distributed covariance. Partials are a few KB per
batch regardless of row count, so the reduce is driver-trivial at any
corpus size; the explode form the differential gate pins would shuffle
n·D² rows instead. BLAS accumulation order differs from the gate form's
rounded scalar sums, so this path is pytest-pinned APPROX-equal
(tests/test_round9.py) rather than hash-gated — the documented
trade for a one-pass matrix kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def moment_partials(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch (n, sum_vec, prod_mat) partials via numpy matmul.

    Output schema: n long, s array<double> (length D), m array<double>
    (row-major D×D). Sum the partial columns to reduce."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "m": [(x.T @ x).reshape(-1).tolist()],
                }
            )

    return emb.select(col).mapInPandas(
        gen, schema="n long, s array<double>, m array<double>"
    )


def covariance_stats(emb: DataFrame, col: str = "embedding"):
    """Reduce the partials to (n, mean vector, covariance matrix) and
    the collapse diagnostics (total variance, participation ratio,
    top-variance dimension) — numerically standard (not the gate's
    rounded-chain arithmetic; see module docstring)."""
    parts = moment_partials(emb, col).collect()
    n = sum(p["n"] for p in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    m = np.zeros((d, d))
    for p in parts:
        s += np.asarray(p["s"])
        m += np.asarray(p["m"]).reshape(d, d)
    mu = s / n
    cov = m / n - np.outer(mu, mu)
    trace_c = float(np.trace(cov))
    trace_c2 = float((cov * cov).sum())
    top_dim = int(np.argmax(np.diag(cov)))
    return {
        "n_vecs": n,
        "dim": d,
        "total_var": trace_c,
        "participation_ratio": trace_c * trace_c / trace_c2,
        "top_var_dim": top_dim,
        "top_var": float(cov[top_dim, top_dim]),
    }
