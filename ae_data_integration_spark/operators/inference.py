"""Batched model-forward executor (SURVEY §2.6 L1-L5, §2.8 C8).

The reference's torch layer enters the engine through ONE bridge: an
Arrow-vectorized ``mapInPandas`` over (key, features) rows, running
a declarative layer spec with numpy matmuls per batch. This mirrors
the DataLoader(batch)->model.eval()->np.concatenate pipeline of
Evaluation_Auxiliary/embedding_from_retrained_models.py:7-92 — the
vertical concat (J5) is implicit in partition output.

torch is intentionally absent from this container; numpy is the
batch-compute kernel. A torch/GPU executor is a drop-in swap of
`_forward` — the Spark plumbing (schema, broadcast weights, Arrow
batching) is identical, which is the part that matters at scale.

Weights travel as a broadcast variable — one copy per executor, not
per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.models.specs import ARCHITECTURES, build_weights

_ACT = {
    "relu": lambda x: np.maximum(x, 0.0),
    "tanh": np.tanh,
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "identity": lambda x: x,
}


def _l2norm_rows(x: np.ndarray) -> np.ndarray:
    """torch F.normalize(p=2, dim=1) with eps=1e-12
    (ref CNC_AE_model_selection.py:219-225)."""
    n = np.sqrt((x * x).sum(axis=1, keepdims=True))
    return x / np.maximum(n, 1e-12)


def _mlp(x: np.ndarray, weights: dict, view: str, kind: str, n_layers: int,
         act: str) -> np.ndarray:
    h = x
    for i in range(n_layers):
        h = h @ weights[f"{view}/{kind}{i}/W"] + weights[f"{view}/{kind}{i}/b"]
        if i < n_layers - 1:  # final layer linear (ref model_structures.py:92)
            h = _ACT[act](h)
    return h


def ae_forward(x1: np.ndarray, x2: np.ndarray, arch: str,
               weights: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run one architecture: returns (embedding, x1_hat, x2_hat)."""
    spec = ARCHITECTURES[arch]
    n_enc = len(spec["enc"]) - 1
    n_dec = len(spec["dec"]) - 1
    act = spec["act"]
    if spec["joint"]:
        x = np.concatenate([x1, x2], axis=1)  # J1 (ref :93)
        z = _mlp(x, weights, "joint", "enc", n_enc, act)
        xhat = _mlp(z, weights, "joint", "dec", n_dec, act)
        d1 = x1.shape[1]
        return z, xhat[:, :d1], xhat[:, d1:]
    z1 = _mlp(x1, weights, "v0", "enc", n_enc, act)
    z2 = _mlp(x2, weights, "v1", "enc", n_enc, act)
    x1_hat = _mlp(z1, weights, "v0", "dec", n_dec, act)
    x2_hat = _mlp(z2, weights, "v1", "dec", n_dec, act)
    if spec["fusion"] == "concat":
        z = np.concatenate([z1, z2], axis=1)  # J3
    elif spec["fusion"] == "concat_joint":
        # SS/JISAE: joint branch over concatenated views, concat all
        # three embeddings (ref embedding_from_retrained_models.py:65-71).
        z12 = _mlp(np.concatenate([x1, x2], axis=1), weights, "shared", "enc",
                   n_enc, act)
        z = np.concatenate([z1, z2, z12], axis=1)
    elif spec["fusion"] == "mean_shared":
        # MOCSS: mean of per-view shared embeddings ⊕ specifics (J4,
        # ref embedding_from_retrained_models.py:73-84).
        s0 = _mlp(x1, weights, "shared0", "enc", n_enc, act)
        s1 = _mlp(x2, weights, "shared1", "enc", n_enc, act)
        z = np.concatenate([(s0 + s1) / 2.0, z1, z2], axis=1)
    else:
        raise ValueError(spec["fusion"])
    return z, x1_hat, x2_hat


def embed_and_recon(
    df: DataFrame,
    arch: str,
    key_col: str = "sample_id",
    v1_col: str = "features_v1",
    v2_col: str = "features_v2",
    view_dims: tuple[int, int] | None = None,
    key_type: str = "long",
    forward=None,
) -> DataFrame:
    """C8 + A2: batched inference producing (key, embedding,
    recon_loss) where recon_loss is the per-subject
    sqrt(Σ(norm(x̂)−norm(x))²) sum over both views
    (ref reconloss_from_retrained_models.py:45,69-72).

    ``forward`` is THE swap point the module docstring names: any
    callable with ``ae_forward``'s signature (numpy batches in,
    (z, x1_hat, x2_hat) out) — e.g.
    ``operators.torch_exec.ae_forward_torch`` on a torch/GPU
    deployment. Default None = the numpy kernel. The Spark side
    (broadcast weights, Arrow batching, output schema) is identical
    either way; kernel equivalence is pinned in
    tests/test_torch_exec.py.

    ``view_dims`` sets the REAL per-view input widths (e.g.
    (20531, 1046) at the reference's production scale); None keeps
    the 32-d fixture default derived from the spec. ``key_type`` is
    the Arrow schema type of ``key_col`` ("long" for the fixture's
    vec_id, "string" for sample ids).
    """
    spark = df.sparkSession
    spec = ARCHITECTURES[arch]
    if view_dims is None:
        # View widths from the spec contract: a joint arch's enc[0] is
        # the concat width, a per-view arch's enc[0] is one view's.
        d = spec["enc"][0] // 2 if spec["joint"] else spec["enc"][0]
        view_dims = (d, d)
    weights = build_weights(arch, view_dims)
    bweights = spark.sparkContext.broadcast(weights)
    fwd = forward if forward is not None else ae_forward

    schema = f"{key_col} {key_type}, embedding array<double>, recon_loss double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bweights.value
        for pdf in batches:
            if not len(pdf):
                continue
            x1 = np.stack(pdf[v1_col].to_numpy())
            x2 = np.stack(pdf[v2_col].to_numpy())
            z, x1_hat, x2_hat = fwd(x1, x2, arch, w)
            r1 = _l2norm_rows(x1_hat) - _l2norm_rows(x1)
            r2 = _l2norm_rows(x2_hat) - _l2norm_rows(x2)
            loss = np.sqrt((r1 * r1).sum(axis=1)) + np.sqrt((r2 * r2).sum(axis=1))
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    "embedding": list(z),
                    "recon_loss": loss,
                }
            )

    return df.mapInPandas(run, schema)


def embed_with_params(
    df: DataFrame,
    params: dict,
    key_col: str = "sample_id",
    v1_col: str = "features_v1",
    v2_col: str = "features_v2",
) -> DataFrame:
    """Pipeline twin of ``embed_and_recon`` that runs TRAINED weights
    (a two-layer tanh AE from operators/train.py) instead of
    spec-built ones: weights broadcast once per executor, Arrow-
    batched mapInPandas over (key, v1, v2) — never a driver-side
    matrix (ref embedding_from_retrained_models.py:7-92 batched
    eval + vertical concat)."""
    spark = df.sparkSession
    bw = spark.sparkContext.broadcast({k: np.asarray(v) for k, v in params.items()})
    schema = f"{key_col} string, embedding array<double>, recon_loss double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bw.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.concatenate(
                [np.stack(pdf[v1_col].to_numpy()), np.stack(pdf[v2_col].to_numpy())],
                axis=1,
            )
            xn = _l2norm_rows(x)
            h = np.tanh(xn @ w["W1"] + w["b1"])
            xhat = h @ w["W2"] + w["b2"]
            recon = np.sqrt(((xhat - xn) ** 2).sum(axis=1))
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].astype(str),
                    "embedding": list(h),
                    "recon_loss": recon,
                }
            )

    return df.mapInPandas(run, schema)
