"""Torch twin of the numpy inference kernel (the documented swap point).

``operators/inference.py`` claims "a torch/GPU executor is a drop-in
swap of the forward kernel — the Spark plumbing (schema, broadcast
weights, Arrow batching) is identical". This module makes that claim
code instead of prose: ``ae_forward_torch`` has the exact signature of
``ae_forward`` (numpy in, numpy out, same ARCHITECTURES spec walk —
ref Evaluation_Auxiliary/embedding_from_retrained_models.py:7-92 /
model_structures.py:92 semantics) and plugs into
``embed_and_recon(..., forward=ae_forward_torch)`` unchanged.

torch is intentionally absent from this container, so the import is
lazy and the parity test (tests/test_torch_exec.py) importorskips —
on a torch-equipped deployment it runs and pins kernel equivalence to
1e-6 across all 8 architectures; here it skips cleanly and the
injection point itself is still exercised with a numpy spy (that test
always runs).

Everything stays float64 under ``no_grad`` so CPU-torch matches numpy
bit-for-bit up to BLAS reassociation; GPU deployments trading down to
float32 re-run the same parity test at their chosen atol.
"""

from __future__ import annotations

import numpy as np

from ae_data_integration_spark.models.specs import ARCHITECTURES

__all__ = ["ae_forward_torch", "torch_available"]


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def _mlp_t(torch, x, weights: dict, view: str, kind: str, n_layers: int,
           act: str):
    acts = {
        "relu": torch.relu,
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "identity": lambda t: t,
    }
    h = x
    for i in range(n_layers):
        w = torch.as_tensor(weights[f"{view}/{kind}{i}/W"], dtype=torch.float64)
        b = torch.as_tensor(weights[f"{view}/{kind}{i}/b"], dtype=torch.float64)
        h = h @ w + b
        if i < n_layers - 1:  # final layer linear, like the numpy kernel
            h = acts[act](h)
    return h


def ae_forward_torch(x1: np.ndarray, x2: np.ndarray, arch: str,
                     weights: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Drop-in twin of ``inference.ae_forward``: same spec walk, torch
    matmuls, numpy arrays out. Raises ImportError where torch is absent
    (callers choose the kernel; nothing auto-routes here)."""
    import torch

    spec = ARCHITECTURES[arch]
    n_enc = len(spec["enc"]) - 1
    n_dec = len(spec["dec"]) - 1
    act = spec["act"]
    with torch.no_grad():
        t1 = torch.as_tensor(x1, dtype=torch.float64)
        t2 = torch.as_tensor(x2, dtype=torch.float64)
        if spec["joint"]:
            x = torch.cat([t1, t2], dim=1)
            z = _mlp_t(torch, x, weights, "joint", "enc", n_enc, act)
            xhat = _mlp_t(torch, z, weights, "joint", "dec", n_dec, act)
            d1 = x1.shape[1]
            return (z.numpy(), xhat[:, :d1].numpy(), xhat[:, d1:].numpy())
        z1 = _mlp_t(torch, t1, weights, "v0", "enc", n_enc, act)
        z2 = _mlp_t(torch, t2, weights, "v1", "enc", n_enc, act)
        x1_hat = _mlp_t(torch, z1, weights, "v0", "dec", n_dec, act)
        x2_hat = _mlp_t(torch, z2, weights, "v1", "dec", n_dec, act)
        if spec["fusion"] == "concat":
            z = torch.cat([z1, z2], dim=1)
        elif spec["fusion"] == "concat_joint":
            z12 = _mlp_t(torch, torch.cat([t1, t2], dim=1), weights,
                         "shared", "enc", n_enc, act)
            z = torch.cat([z1, z2, z12], dim=1)
        elif spec["fusion"] == "mean_shared":
            s0 = _mlp_t(torch, t1, weights, "shared0", "enc", n_enc, act)
            s1 = _mlp_t(torch, t2, weights, "shared1", "enc", n_enc, act)
            z = torch.cat([(s0 + s1) / 2.0, z1, z2], dim=1)
        else:
            raise ValueError(spec["fusion"])
        return z.numpy(), x1_hat.numpy(), x2_hat.numpy()
