"""Exact 2-D t-SNE for plot-scale embeddings (C7's visualization leg).

The reference's t-SNE is a driver-side sklearn call on the (~1.8k
sample) embedding matrix feeding a scatter plot
(Evaluation_Auxiliary/tsn_visulization.py:8-27 — TSNE(n_components=2,
init='pca'), default perplexity 30). This module closes that residual
with a dependency-free exact implementation of the published
algorithm (van der Maaten & Hinton, JMLR 2008) under the engine's
determinism discipline:

* exact O(N²) affinities — correct at plot scale by definition (the
  reference itself never runs t-SNE above a few thousand points; the
  module REFUSES larger inputs rather than silently degrading, the
  same driver-side contract as `_driver_union_find`);
* per-point bandwidths by binary search to the target perplexity,
  symmetrized joint P with early exaggeration (×12 for the first
  quarter of the schedule);
* PCA initialization (the reference's ``init='pca'``) — fully
  deterministic given the data: no RNG anywhere, so two runs are
  bit-identical and the KL trajectory is replayable;
* gradient descent with classic momentum 0.5→0.8 and learning rate
  200 (the JMLR schedule sklearn's defaults descend from).

The Spark side collects (key, vec) once — the documented plot-scale
exception, like the reference's own .fit_transform — and returns the
coordinates as a DataFrame so downstream joins/sinks stay in plan
space. Distributed reduction is NOT the goal here; C7's oracled PCA
covariance path (operators/cca.py) is the scale-bearing projection.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double

__all__ = ["tsne_2d", "tsne_fit_numpy"]

MAX_PLOT_POINTS = 20_000


def _pairwise_sq_dists(x: np.ndarray) -> np.ndarray:
    s = (x * x).sum(axis=1)
    d = s[:, None] + s[None, :] - 2.0 * (x @ x.T)
    np.fill_diagonal(d, 0.0)
    return np.maximum(d, 0.0)


def _cond_probs(d_row: np.ndarray, i: int, perplexity: float) -> np.ndarray:
    """Binary-search beta (=1/2σ²) for row i to hit log(perplexity)."""
    target = np.log(perplexity)
    beta, lo, hi = 1.0, 0.0, np.inf
    mask = np.ones(len(d_row), dtype=bool)
    mask[i] = False
    dr = d_row[mask]
    for _ in range(64):
        p = np.exp(-dr * beta)
        sp = p.sum()
        if sp <= 0:
            h = 0.0
            p = np.zeros_like(dr)
        else:
            p = p / sp
            nz = p > 0
            h = -(p[nz] * np.log(p[nz])).sum()
        if abs(h - target) < 1e-5:
            break
        if h > target:  # entropy too high → narrow the kernel
            lo = beta
            beta = beta * 2.0 if hi == np.inf else (beta + hi) / 2.0
        else:
            hi = beta
            beta = (beta + lo) / 2.0
    out = np.zeros(len(d_row))
    out[mask] = p
    return out


def _pca_init(x: np.ndarray, dims: int = 2) -> np.ndarray:
    xc = x - x.mean(axis=0, keepdims=True)
    # top eigenvectors of the d×d covariance — deterministic up to
    # sign; pin the sign by the largest-magnitude coordinate
    cov = (xc.T @ xc) / max(len(xc) - 1, 1)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:dims]]
    for j in range(comps.shape[1]):
        k = int(np.argmax(np.abs(comps[:, j])))
        if comps[k, j] < 0:
            comps[:, j] = -comps[:, j]
    y = xc @ comps
    # sklearn scales PCA init so the first axis has std 1e-4
    s = y[:, 0].std()
    return y * (1e-4 / s) if s > 0 else y


def tsne_fit_numpy(
    x: np.ndarray,
    perplexity: float = 30.0,
    n_iter: int = 500,
    learning_rate: float = 200.0,
    return_kl: bool = False,
):
    """Exact t-SNE to 2-D. Deterministic (PCA init, no RNG)."""
    n = len(x)
    if n > MAX_PLOT_POINTS:
        raise ValueError(
            f"tsne_2d is the plot-scale driver-side leg (N={n} > "
            f"{MAX_PLOT_POINTS}); project with the distributed PCA path "
            "(c7b) or sample first"
        )
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    d = _pairwise_sq_dists(x.astype(np.float64))
    cond = np.stack([_cond_probs(d[i], i, perplexity) for i in range(n)])
    p = (cond + cond.T) / (2.0 * n)
    p = np.maximum(p, 1e-12)

    y = _pca_init(x)
    vel = np.zeros_like(y)
    exag_until = n_iter // 4
    p_run = p * 12.0  # early exaggeration
    kls: list[float] = []
    for it in range(n_iter):
        if it == exag_until:
            p_run = p
        num = 1.0 / (1.0 + _pairwise_sq_dists(y))
        np.fill_diagonal(num, 0.0)
        q = np.maximum(num / num.sum(), 1e-12)
        pq = (p_run - q) * num
        grad = 4.0 * ((np.diag(pq.sum(axis=1)) - pq) @ y)
        momentum = 0.5 if it < exag_until else 0.8
        vel = momentum * vel - learning_rate * grad
        y = y + vel
        y = y - y.mean(axis=0, keepdims=True)
        if return_kl and (it % 50 == 0 or it == n_iter - 1):
            kls.append(float((p * np.log(p / q)).sum()))
    return (y, kls) if return_kl else y


def tsne_2d(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    perplexity: float = 30.0,
    n_iter: int = 500,
) -> DataFrame:
    """C7 visualization leg: collect plot-scale (key, vec) rows, run
    the exact seeded t-SNE, return (key, tsne_1, tsne_2). Sorted by
    key before fitting so the result is independent of partitioning
    and scan order."""
    spark = df.sparkSession
    rows = (
        df.select(F.col(key_col).alias("k"), to_double(vec_col).alias("v"))
        .orderBy("k")
        .collect()
    )
    keys = [r["k"] for r in rows]
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    y = tsne_fit_numpy(x, perplexity=perplexity, n_iter=n_iter)
    out = [(k, float(y[i, 0]), float(y[i, 1])) for i, k in enumerate(keys)]
    return spark.createDataFrame(
        out, f"{key_col} long, tsne_1 double, tsne_2 double"
    )
