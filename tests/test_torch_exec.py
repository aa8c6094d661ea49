"""The torch drop-in swap claim, as tests (SURVEY §5 training layer).

Two layers of proof:
* the INJECTION POINT always runs — a numpy spy passed as
  ``embed_and_recon(forward=...)`` must be what actually executes on
  the executors and must reproduce the default path bit-for-bit;
* the TORCH KERNEL itself importorskips (torch absent from this
  container by design — same guard pattern as the former optuna
  test): on a torch-equipped deployment every architecture's
  ``ae_forward_torch`` output is pinned to the numpy kernel at 1e-6,
  and the full Spark path (broadcast weights + Arrow batches) is run
  once with the torch kernel injected.
"""

from __future__ import annotations

import numpy as np
import pytest

from ae_data_integration_spark.models.specs import ARCHITECTURES, build_weights
from ae_data_integration_spark.operators.inference import ae_forward, embed_and_recon


def _batch(arch: str, n: int = 7, seed: int = 3):
    spec = ARCHITECTURES[arch]
    d = spec["enc"][0] // 2 if spec["joint"] else spec["enc"][0]
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)), rng.normal(size=(n, d)), (d, d)


def test_forward_injection_point_is_live(spark):
    """embed_and_recon(forward=spy) must route every batch through the
    injected kernel and (with a pass-through spy) equal the default
    path exactly — proving the swap point is real plumbing, not
    documentation."""
    rows = [(i, [float(i), 1.0, 0.5, -1.0] * 8, [0.25, float(-i), 2.0, 1.0] * 8)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "sample_id long, features_v1 array<double>, features_v2 array<double>"
    ).repartition(4)

    def spy(x1, x2, arch, w):
        z, h1, h2 = ae_forward(x1, x2, arch, w)
        return z + 0.0, h1, h2  # pass-through with a new array

    base = embed_and_recon(df, "CNC", view_dims=(32, 32)).collect()
    spied = embed_and_recon(df, "CNC", view_dims=(32, 32), forward=spy).collect()
    b = {r["sample_id"]: (r["embedding"], r["recon_loss"]) for r in base}
    s = {r["sample_id"]: (r["embedding"], r["recon_loss"]) for r in spied}
    assert b == s and len(b) == 40

    def broken(x1, x2, arch, w):
        z, h1, h2 = ae_forward(x1, x2, arch, w)
        return z + 1.0, h1, h2

    poked = embed_and_recon(df, "CNC", view_dims=(32, 32), forward=broken).collect()
    p = {r["sample_id"]: r["embedding"] for r in poked}
    assert all(abs(p[k][0] - b[k][0][0] - 1.0) < 1e-12 for k in b)


def test_torch_kernel_matches_numpy_all_architectures():
    torch = pytest.importorskip("torch")  # noqa: F841 - absent here by design
    from ae_data_integration_spark.operators.torch_exec import ae_forward_torch

    for arch in sorted(ARCHITECTURES):
        x1, x2, dims = _batch(arch)
        w = build_weights(arch, dims)
        zn, h1n, h2n = ae_forward(x1, x2, arch, w)
        zt, h1t, h2t = ae_forward_torch(x1, x2, arch, w)
        np.testing.assert_allclose(zt, zn, atol=1e-6, err_msg=arch)
        np.testing.assert_allclose(h1t, h1n, atol=1e-6, err_msg=arch)
        np.testing.assert_allclose(h2t, h2n, atol=1e-6, err_msg=arch)


def test_torch_kernel_through_spark_plumbing(spark):
    pytest.importorskip("torch")
    from ae_data_integration_spark.operators.torch_exec import ae_forward_torch

    rows = [(i, [float(i % 5), -0.5, 1.5, 0.0] * 8, [1.0, 0.25, float(i % 3), -2.0] * 8)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "sample_id long, features_v1 array<double>, features_v2 array<double>"
    )
    base = embed_and_recon(df, "JISAE", view_dims=(32, 32)).collect()
    with_torch = embed_and_recon(
        df, "JISAE", view_dims=(32, 32), forward=ae_forward_torch
    ).collect()
    b = sorted((r["sample_id"], tuple(r["embedding"])) for r in base)
    t = sorted((r["sample_id"], tuple(r["embedding"])) for r in with_torch)
    for (kb, eb), (kt, et) in zip(b, t):
        assert kb == kt
        np.testing.assert_allclose(et, eb, atol=1e-6)


def test_torch_available_probe_is_honest():
    from ae_data_integration_spark.operators import torch_exec

    probe = torch_exec.torch_available()
    try:
        import torch  # noqa: F401

        assert probe is True
    except ImportError:
        assert probe is False
