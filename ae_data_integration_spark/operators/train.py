"""Training + model-selection control plane (SURVEY §2.9 O1-O8,
§2.7 A1/A3/A6/A7/A10).

The reference's Objective_CV (CNC_AE_model_selection.py:319-381)
trains a fresh model per CV fold and averages validation losses.
Spark-idiomatic shape: ALL folds train **in parallel** — the dataset
is replicated once per test fold (exactly the 5× the reference also
pays, serially), grouped by fold, and `applyInPandas` runs one
training loop per group, one Spark task per fold. The driver-side
search loop (Optuna's TPE when installed, the vendored seeded TPE of
operators/tpe.py otherwise, or the md5-deterministic random sampler
on request) only sees (fold, val_loss) rows.

Kernels are numpy (torch absent by design — same swap point as
operators/inference.py): full-batch/minibatch forward-backward for a
two-layer AE with tanh, Adam with L2 (O5), deterministic md5-seeded
init and shuffling (O6 discipline, SURVEY §4.2a).

A10: per-epoch averages accumulate inside the loop; the reference's
validation-divisor quirk (val loss divided by the *training* last-
batch size, CNC_AE_model_selection.py:304) is reproduced behind
``compat_val_divisor=True``.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.hashing import md5_bucket

# O2 search space (ref CNC_AE_model_selection.py:331-344, fixture-scaled)
SEARCH_SPACE = {
    "lr": (1e-4, 1e-2, "log"),
    "l2_lambda": (1e-8, 1e-5, "log"),
    "batch_size": [32, 64, 128],
    "epochs": [5, 10],
    "hidden": [8, 16],
    # L3 train-time dropout (ref model_structures.py:68-69 sampled in
    # CNC_AE_model_selection.py:331-344). Eval mode is identity.
    "dropout": [0.0, 0.1, 0.2, 0.4, 0.6],
}


def _seed_from(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def sample_params(trial: int, salt: str = "search") -> dict:
    """md5-deterministic random-search sampler (Optuna stand-in)."""
    rng = np.random.default_rng(_seed_from(f"{salt}:{trial}"))
    lo, hi, _ = SEARCH_SPACE["lr"]
    lr = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    lo, hi, _ = SEARCH_SPACE["l2_lambda"]
    l2 = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    return {
        "lr": lr,
        "l2_lambda": l2,
        "batch_size": int(rng.choice(SEARCH_SPACE["batch_size"])),
        "epochs": int(rng.choice(SEARCH_SPACE["epochs"])),
        "hidden": int(rng.choice(SEARCH_SPACE["hidden"])),
        # drawn LAST so pre-dropout params of historical trials are
        # unchanged by the search-space extension
        "dropout": float(rng.choice(SEARCH_SPACE["dropout"])),
    }


def _l2norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.sqrt((x * x).sum(axis=1, keepdims=True))
    return x / np.maximum(n, 1e-12)


def _init_ae(d_in: int, hidden: int, seed: int) -> dict:
    rng = np.random.default_rng(seed)
    s1 = np.sqrt(6.0 / (d_in + hidden))
    return {
        "W1": rng.uniform(-s1, s1, (d_in, hidden)),
        "b1": np.zeros(hidden),
        "W2": rng.uniform(-s1, s1, (hidden, d_in)),
        "b2": np.zeros(d_in),
    }


def _forward(params: dict, x: np.ndarray, dmask: np.ndarray | None = None):
    """dmask is an INVERTED-dropout multiplier (0 or 1/(1−p)) on the
    hidden layer — None in eval mode (L3: dropout = identity at eval)."""
    h = np.tanh(x @ params["W1"] + params["b1"])
    hd = h if dmask is None else h * dmask
    xhat = hd @ params["W2"] + params["b2"]
    return h, hd, xhat


def _loss_and_grads(
    params: dict,
    x: np.ndarray,
    l2_lambda: float,
    dmask: np.ndarray | None = None,
):
    """Frobenius recon loss ‖x̂−norm(x)‖_F (A1 shape) + L2 penalty."""
    xn = _l2norm_rows(x)
    h, hd, xhat = _forward(params, xn, dmask)
    diff = xhat - xn
    fro = np.sqrt(max((diff * diff).sum(), 1e-24))
    # d fro / d xhat = diff / fro
    g_xhat = diff / fro
    gW2 = hd.T @ g_xhat + l2_lambda * params["W2"]
    gb2 = g_xhat.sum(axis=0)
    g_h = g_xhat @ params["W2"].T
    if dmask is not None:
        g_h = g_h * dmask
    g_pre = g_h * (1.0 - h * h)
    gW1 = xn.T @ g_pre + l2_lambda * params["W1"]
    gb1 = g_pre.sum(axis=0)
    return fro, {"W1": gW1, "b1": gb1, "W2": gW2, "b2": gb2}


def _adam_step(params, grads, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    for k in params:
        m[k] = b1 * m[k] + (1 - b1) * grads[k]
        v[k] = b2 * v[k] + (1 - b2) * grads[k] ** 2
        mh = m[k] / (1 - b1**t)
        vh = v[k] / (1 - b2**t)
        params[k] = params[k] - lr * mh / (np.sqrt(vh) + eps)


def train_ae_numpy(
    x_train: np.ndarray,
    x_val: np.ndarray | None,
    hyper: dict,
    seed: int,
    compat_val_divisor: bool = False,
) -> tuple[dict, list[float], float]:
    """One training run; returns (params, per-epoch train losses,
    final val loss). Deterministic for a given (data, hyper, seed)."""
    params = _init_ae(x_train.shape[1], hyper["hidden"], seed)
    m = {k: np.zeros_like(p) for k, p in params.items()}
    v = {k: np.zeros_like(p) for k, p in params.items()}
    rng = np.random.default_rng(seed + 1)
    bs = int(hyper["batch_size"])
    p_drop = float(hyper.get("dropout", 0.0))
    t = 0
    epoch_losses: list[float] = []
    last_batch_n = bs
    for _epoch in range(int(hyper["epochs"])):
        order = rng.permutation(len(x_train))  # R3 shuffled batching
        total, nb = 0.0, 0
        for i in range(0, len(order), bs):
            xb = x_train[order[i : i + bs]]
            last_batch_n = len(xb)
            dmask = None
            if p_drop > 0.0:
                # md5-derived per (seed, epoch, batch) — partition-
                # independent like every other seed in the engine (O6),
                # so cv_loss is bit-identical under any repartitioning.
                drng = np.random.default_rng(
                    _seed_from(f"{seed}:do:{_epoch}:{i}")
                )
                dmask = (
                    drng.random((len(xb), params["b1"].shape[0])) >= p_drop
                ) / (1.0 - p_drop)
            loss, grads = _loss_and_grads(
                params, xb, hyper["l2_lambda"], dmask
            )
            t += 1
            _adam_step(params, grads, m, v, t, hyper["lr"])
            total += loss
            nb += 1
        epoch_losses.append(total / max(nb, 1))  # A10 averaging
    val_loss = float("nan")
    if x_val is not None and len(x_val):
        vloss, _ = _loss_and_grads(params, x_val, 0.0)
        if compat_val_divisor:
            # A10 divisor quirk (ref CNC_AE_model_selection.py:304):
            # the reference divides by the TRAIN loop's last batch size.
            val_loss = float(vloss / last_batch_n)
        else:
            val_loss = float(vloss)
    return params, epoch_losses, val_loss


def objective_cv(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    hyper: dict | None = None,
    n_folds: int = 5,
    salt: str = "cv21",
    compat_val_divisor: bool = False,
    fold_salt: str | None = None,
    seed_salt: str | None = None,
) -> DataFrame:
    """O3: one trial's k-fold CV — every fold trains in parallel.

    Rows are replicated once per test fold (flag marks val rows),
    grouped by fold, and applyInPandas runs the numpy training loop
    per group — one executor task per fold, zero driver loops.
    Returns (fold, n_train, n_val, val_loss, last_train_loss).

    ``fold_salt``/``seed_salt`` default to ``salt``; a multi-trial
    search passes a fixed fold_salt (same folds every trial, the
    reference's KFold reuse) and a per-trial seed_salt (fresh init
    per trial).
    """
    hyper = hyper or sample_params(0)
    fold_salt = salt if fold_salt is None else fold_salt
    salt = salt if seed_salt is None else seed_salt
    base = df.select(
        F.col(key_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("vec"),
        md5_bucket(key_col, n_folds, fold_salt).alias("fold"),
    )
    replicated = base.select(
        "id", "vec",
        F.explode(F.sequence(F.lit(0), F.lit(n_folds - 1))).alias("test_fold"),
        F.col("fold"),
    ).withColumn("is_val", F.col("fold") == F.col("test_fold"))

    schema = (
        "fold int, n_train long, n_val long, val_loss double, last_train_loss double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf["test_fold"].iloc[0])
        tr = pdf[~pdf["is_val"]]
        va = pdf[pdf["is_val"]]
        # Deterministic row order regardless of partitioning (O6).
        tr = tr.sort_values("id")
        va = va.sort_values("id")
        x_tr = np.stack(tr["vec"].to_numpy())
        x_va = np.stack(va["vec"].to_numpy()) if len(va) else None
        _, losses, val = train_ae_numpy(
            x_tr, x_va, hyper, seed=_seed_from(f"{salt}:fold{k}"),
            compat_val_divisor=compat_val_divisor,
        )
        return pd.DataFrame(
            {
                "fold": [k],
                "n_train": [len(tr)],
                "n_val": [len(va)],
                "val_loss": [val],
                "last_train_loss": [losses[-1] if losses else float("nan")],
            }
        )

    return (
        replicated.groupBy("test_fold")
        .applyInPandas(run, schema)
        .orderBy("fold")
    )


def train_full_on_executor(
    df: DataFrame,
    key_col: str = "sample_id",
    vec_col: str = "vec",
    hyper: dict | None = None,
    seed: int = 0,
) -> dict:
    """O4 retrain with zero driver-side data movement: every row routes
    to ONE applyInPandas group (a single executor task — the analogue
    of the reference's one GPU worker), the numpy training loop runs
    there, and only the flattened WEIGHTS come back to the driver
    (k×d rows, model-sized, not data-sized).

    At genuine 100-TB scale a single-model SGD retrain becomes a
    torch-distributed job; this function encodes the Spark-side
    contract that job must honor — deterministic row order (sort by
    key), md5-derived seed, weights as the only driver-bound output
    (ref CNC_AE_model_selection.py:528-552 retrain stage).
    """
    hyper = hyper or sample_params(0)
    base = df.select(
        F.col(key_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("vec"),
        F.lit(0).alias("_g"),
    )
    schema = "name string, idx long, vals array<double>"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        x = np.stack(pdf["vec"].to_numpy())
        params, _, _ = train_ae_numpy(x, None, hyper, seed=seed)
        names, idxs, vals = [], [], []
        for name, arr in params.items():
            if arr.ndim == 1:
                names.append(name); idxs.append(-1)
                vals.append([float(v) for v in arr])
            else:
                for i, row in enumerate(arr):
                    names.append(name); idxs.append(i)
                    vals.append([float(v) for v in row])
        return pd.DataFrame({"name": names, "idx": idxs, "vals": vals})

    rows = base.groupBy("_g").applyInPandas(run, schema).collect()
    out: dict[str, np.ndarray] = {}
    by_name: dict[str, list] = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append((r["idx"], r["vals"]))
    for name, items in by_name.items():
        if len(items) == 1 and items[0][0] == -1:
            out[name] = np.array(items[0][1])
        else:
            out[name] = np.array([v for _, v in sorted(items)])
    return out


def random_search(
    df: DataFrame,
    n_trials: int = 3,
    n_folds: int = 3,
    sampler: str = "auto",
    **kw,
) -> list[tuple[int, dict, float]]:
    """O1 control plane: each trial's folds run as one parallel Spark
    job; the driver-side search loop sees only (fold, val_loss) rows.

    ``sampler``: "auto" = Optuna's TPE when the package is installed,
    else the vendored seeded TPE (operators/tpe.py — the reference's
    TPESampler + MedianPruner(n_warmup_steps=2) semantics,
    CNC_AE_model_selection.py:528-534, vendored per Bergstra 2011
    because optuna isn't installable everywhere); "md5" = the
    deterministic random-search fallback; "optuna"/"tpe" force one
    branch.
    """
    results: list[tuple[int, dict, float]] = []
    try:
        import optuna  # noqa: F401

        have_optuna = True
    except ImportError:
        have_optuna = False
    if sampler == "optuna" and not have_optuna:
        raise ImportError("sampler='optuna' but optuna is not installed")
    use_optuna = sampler == "optuna" or (sampler == "auto" and have_optuna)
    use_tpe = sampler == "tpe" or (sampler == "auto" and not have_optuna)

    def run_trial(trial_idx: int, hyper: dict) -> float:
        rows = objective_cv(df, hyper=hyper, n_folds=n_folds, **kw).collect()
        return float(np.mean([r["val_loss"] for r in rows]))

    if use_tpe:
        from ae_data_integration_spark.operators.tpe import (
            MedianPruner,
            tpe_minimize,
        )

        def fold_losses(hyper: dict) -> list[float]:
            rows = objective_cv(
                df, hyper=hyper, n_folds=n_folds, **kw
            ).collect()
            return [r["val_loss"] for r in sorted(rows, key=lambda r: r["fold"])]

        trials = tpe_minimize(
            fold_losses,
            SEARCH_SPACE,
            n_trials=n_trials,
            seed=21,
            pruner=MedianPruner(n_warmup_steps=2),
        )
        return [(t, params, value) for t, params, value, _state in trials]

    if use_optuna:  # pragma: no cover - optuna absent in this container
        import optuna

        def objective(trial):
            hyper = {
                "lr": trial.suggest_float("lr", 1e-4, 1e-2, log=True),
                "l2_lambda": trial.suggest_float("l2_lambda", 1e-8, 1e-5, log=True),
                "batch_size": trial.suggest_categorical("batch_size", SEARCH_SPACE["batch_size"]),
                "epochs": trial.suggest_categorical("epochs", SEARCH_SPACE["epochs"]),
                "hidden": trial.suggest_categorical("hidden", SEARCH_SPACE["hidden"]),
            }
            return run_trial(trial.number, hyper)

        # Seeded TPE sampler: the study must be as reproducible as the
        # md5 fallback (the reference seeds its optuna runs the same
        # way, CNC_AE_model_selection.py setup_seed(21)).
        study = optuna.create_study(
            direction="minimize",
            sampler=optuna.samplers.TPESampler(seed=21),
        )
        study.optimize(objective, n_trials=n_trials)
        return [(t.number, t.params, t.value) for t in study.trials]

    for i in range(n_trials):
        hyper = sample_params(i)
        results.append((i, hyper, run_trial(i, hyper)))
    return results


# --- Contrastive losses (SURVEY A6/A7) ---------------------------------------
# NT-Xent InstanceLoss (ref Simulation_Auxiliary/contrastive_loss.py:8-67):
# sim = (z·zᵀ)/τ over the stacked batch [z_i; z_j] of two views,
# positives at the ±B diagonals, mask removes self and positive pairs,
# CrossEntropyLoss(reduction=sum)/(2B).


def instance_loss(z_i: np.ndarray, z_j: np.ndarray, temperature: float = 0.5) -> float:
    b = z_i.shape[0]
    z = np.concatenate([z_i, z_j], axis=0)
    zn = _l2norm_rows(z)
    sim = (zn @ zn.T) / temperature
    pos = np.concatenate([np.diag(sim, b), np.diag(sim, -b)])  # 2B positives
    mask = np.ones_like(sim, dtype=bool)
    np.fill_diagonal(mask, False)
    for k in range(b):  # remove positive pairs from the negatives
        mask[k, k + b] = False
        mask[k + b, k] = False
    total = 0.0
    for row in range(2 * b):
        logits = np.concatenate([[pos[row]], sim[row][mask[row]]])
        logits = logits - logits.max()  # stable softmax-CE, target idx 0
        total += -(logits[0] - np.log(np.exp(logits).sum()))
    return float(total / (2 * b))


def mocss_composite_loss(
    z_shared_i: np.ndarray,
    z_shared_j: np.ndarray,
    z_spec_i: np.ndarray,
    z_spec_j: np.ndarray,
    recon: float,
    ortho_multiplier: float = 1.0,
    temperature: float = 0.4,
) -> float:
    """A6 (ref MOCSS_AE_model_selection.py:46-119, mocss.py:34-135):
    ortho = mean(norm(shared) ⊙ norm(specific)) per view — the
    reference's SharedAndSpecificLoss.orthogonal_loss row-L2-normalizes
    BOTH inputs first (F.normalize(p=2, dim=1),
    MOCSS_AE_model_selection.py:56-62); + NT-Xent over the two shared
    embeddings (temperature fixed 0.4, ref :289); the study's tuned
    weight applies to RECON (ref MOCSS_AE_model_selection.py:291).
    """
    ortho = float(
        np.mean(_l2norm_rows(z_shared_i) * _l2norm_rows(z_spec_i))
        + np.mean(_l2norm_rows(z_shared_j) * _l2norm_rows(z_spec_j))
    )
    contrastive = instance_loss(z_shared_i, z_shared_j, temperature)
    return ortho + contrastive + ortho_multiplier * recon


def cluster_loss(
    c_i: np.ndarray, c_j: np.ndarray, temperature: float = 1.0
) -> float:
    """A8 ClusterLoss (ref contrastive_loss.py:70-116): contrastive
    over cluster-assignment COLUMNS (cosine sim of the k columns of
    the two views' soft assignments) plus the negative-entropy of the
    mean assignment per view. Unused by the 8 pipelines (MOCSS-paper
    extra) — shipped for completeness."""
    k = c_i.shape[1]

    def neg_entropy(c: np.ndarray) -> float:
        # ref contrastive_loss.py:93-96: ne_i = log(p.size(0)) + Σ p·log p
        p = c.sum(axis=0) / c.sum()
        p = np.clip(p, 1e-12, None)
        return float(math.log(len(p)) + (p * np.log(p)).sum())

    cols = np.concatenate([c_i.T, c_j.T], axis=0)  # 2k rows = columns
    cn = _l2norm_rows(cols)
    sim = cn @ cn.T / temperature
    total = 0.0
    for r in range(2 * k):
        pos_c = r + k if r < k else r - k
        mask = np.ones(2 * k, dtype=bool)
        mask[r] = False
        mask[pos_c] = False
        logits = np.concatenate([[sim[r, pos_c]], sim[r][mask]])
        logits = logits - logits.max()
        total += -(logits[0] - np.log(np.exp(logits).sum()))
    return float(total / (2 * k)) + neg_entropy(c_i) + neg_entropy(c_j)
