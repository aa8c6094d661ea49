"""Exact plot-scale t-SNE (C7 visualization leg, reference
tsn_visulization.py semantics): determinism, KL descent, cluster
separation, plot-scale guard."""

from __future__ import annotations

import numpy as np
import pytest

from ae_data_integration_spark.operators.tsne import (
    MAX_PLOT_POINTS,
    tsne_2d,
    tsne_fit_numpy,
)


def _blobs(n_per=40, seed=7):
    rng = np.random.default_rng(seed)
    centers = np.array([[8.0] * 8, [-8.0] * 8, [8.0] * 4 + [-8.0] * 4])
    x = np.concatenate([c + rng.normal(0, 0.5, size=(n_per, 8)) for c in centers])
    labels = np.repeat([0, 1, 2], n_per)
    return x, labels


def test_tsne_deterministic_and_kl_decreases():
    x, _ = _blobs()
    y1, kl = tsne_fit_numpy(x, n_iter=300, return_kl=True)
    y2 = tsne_fit_numpy(x, n_iter=300)
    assert np.array_equal(y1, y2)  # PCA init, no RNG: bit-identical
    assert kl[-1] < kl[0]
    assert np.isfinite(y1).all()


def test_tsne_separates_blobs():
    x, labels = _blobs()
    y = tsne_fit_numpy(x, n_iter=300)
    cents = np.stack([y[labels == c].mean(axis=0) for c in range(3)])
    intra = max(
        np.linalg.norm(y[labels == c] - cents[c], axis=1).mean() for c in range(3)
    )
    inter = min(
        np.linalg.norm(cents[a] - cents[b])
        for a in range(3) for b in range(a + 1, 3)
    )
    assert inter > 3 * intra  # well-separated blobs stay separated in 2-D


def test_tsne_plot_scale_guard():
    with pytest.raises(ValueError, match="plot-scale"):
        tsne_fit_numpy(np.zeros((MAX_PLOT_POINTS + 1, 2)))


def test_tsne_2d_dataframe_roundtrip(spark):
    from ae_data_integration_spark.tables import table
    from tests.conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "embeddings").limit(120)
    out = tsne_2d(e, n_iter=120).collect()
    assert len(out) == 120
    assert all(np.isfinite([r["tsne_1"], r["tsne_2"]]).all() for r in out)
    # partition-independence: same coords under a different layout
    out2 = tsne_2d(e.repartition(7), n_iter=120).collect()
    assert sorted((r["vec_id"], r["tsne_1"], r["tsne_2"]) for r in out) == \
           sorted((r["vec_id"], r["tsne_1"], r["tsne_2"]) for r in out2)
