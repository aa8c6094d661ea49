"""Training control plane: determinism, loss decrease, divisor quirk,
artifact round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from ae_data_integration_spark.operators.artifacts import load_weights, save_weights
from ae_data_integration_spark.operators.train import (
    SEARCH_SPACE,
    objective_cv,
    random_search,
    sample_params,
    train_ae_numpy,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def xdata():
    rng = np.random.default_rng(7)
    return rng.normal(size=(120, 32))


def test_loss_decreases(xdata):
    hyper = {"lr": 3e-3, "l2_lambda": 1e-7, "batch_size": 32, "epochs": 8, "hidden": 8}
    _, losses, _ = train_ae_numpy(xdata, None, hyper, seed=1)
    assert losses[-1] < losses[0] * 0.9


def test_training_deterministic(xdata):
    hyper = sample_params(1)
    p1, l1, _ = train_ae_numpy(xdata, xdata[:10], hyper, seed=5)
    p2, l2, _ = train_ae_numpy(xdata, xdata[:10], hyper, seed=5)
    assert l1 == l2
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k])


def test_divisor_quirk(xdata):
    hyper = {"lr": 1e-3, "l2_lambda": 0.0, "batch_size": 50, "epochs": 1, "hidden": 8}
    _, _, v_plain = train_ae_numpy(xdata, xdata[:30], hyper, seed=2)
    _, _, v_quirk = train_ae_numpy(
        xdata, xdata[:30], hyper, seed=2, compat_val_divisor=True
    )
    # 120 rows / bs 50 -> last train batch has 20 rows; quirk divides
    # the same raw loss by 20 (ref CNC_AE_model_selection.py:304).
    assert v_quirk == pytest.approx(v_plain / 20.0)


def test_objective_cv_parallel_folds(spark):
    e = table(spark, SF_SMOKE, "embeddings")
    hyper = {"lr": 3e-3, "l2_lambda": 1e-7, "batch_size": 64, "epochs": 2, "hidden": 8}
    rows = objective_cv(e, hyper=hyper, n_folds=5).collect()
    assert len(rows) == 5
    assert sum(r["n_val"] for r in rows) == e.count()
    for r in rows:
        assert np.isfinite(r["val_loss"]) and r["val_loss"] > 0
    # Determinism across runs (applyInPandas sorts rows internally).
    rows2 = objective_cv(e, hyper=hyper, n_folds=5).collect()
    assert [r["val_loss"] for r in rows] == [r["val_loss"] for r in rows2]


def test_random_search_deterministic_params():
    assert sample_params(3) == sample_params(3)
    assert sample_params(3) != sample_params(4)


def test_random_search_runs(spark):
    e = table(spark, SF_SMOKE, "embeddings").limit(200)
    res = random_search(e, n_trials=2, n_folds=2)
    assert len(res) == 2
    assert all(np.isfinite(v) for _, _, v in res)


def test_artifact_roundtrip(spark, tmp_path):
    from ae_data_integration_spark.models.specs import build_weights

    w = build_weights("CNC", (32, 32))
    path = str(tmp_path / "model.parquet")
    save_weights(spark, w, path, meta={"arch": "CNC"})
    back = load_weights(spark, path)
    assert set(back) == set(w)
    for k in w:
        np.testing.assert_array_equal(back[k], w[k])


def test_instance_loss_matches_direct_softmax():
    """NT-Xent golden: brute-force recomputation on a tiny batch."""
    from ae_data_integration_spark.operators.train import instance_loss

    rng = np.random.default_rng(3)
    zi, zj = rng.normal(size=(4, 6)), rng.normal(size=(4, 6))
    got = instance_loss(zi, zj, temperature=0.5)

    z = np.concatenate([zi, zj])
    zn = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    sim = zn @ zn.T / 0.5
    b = 4
    total = 0.0
    for r in range(2 * b):
        pos_c = r + b if r < b else r - b
        negs = [c for c in range(2 * b) if c != r and c != pos_c]
        logits = np.array([sim[r, pos_c]] + [sim[r, c] for c in negs])
        p = np.exp(logits - logits.max())
        total += -np.log(p[0] / p.sum())
    assert got == pytest.approx(total / (2 * b), rel=1e-12)


def test_mocss_composite_combines():
    from ae_data_integration_spark.operators.train import (
        instance_loss,
        mocss_composite_loss,
    )

    rng = np.random.default_rng(4)
    sh_i, sh_j = rng.normal(size=(4, 6)), rng.normal(size=(4, 6))
    sp_i, sp_j = rng.normal(size=(4, 6)), rng.normal(size=(4, 6))
    got = mocss_composite_loss(sh_i, sh_j, sp_i, sp_j, recon=2.0, ortho_multiplier=0.5)

    def l2n(m):
        # ref MOCSS_AE_model_selection.py:56-62 F.normalize(p=2, dim=1)
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    want = (
        float(np.mean(l2n(sh_i) * l2n(sp_i)) + np.mean(l2n(sh_j) * l2n(sp_j)))
        + instance_loss(sh_i, sh_j, 0.4)
        + 0.5 * 2.0
    )
    assert got == pytest.approx(want, rel=1e-12)


def test_cluster_loss_structure():
    """A8: identical assignments minimize the contrastive part; the
    full loss matches a brute-force recomputation including the
    log(k) entropy offset (ref contrastive_loss.py:93-96)."""
    import math

    from ae_data_integration_spark.operators.train import cluster_loss

    rng = np.random.default_rng(9)
    c = np.abs(rng.normal(size=(30, 5)))
    c = c / c.sum(axis=1, keepdims=True)
    same = cluster_loss(c, c)
    diff = cluster_loss(c, np.roll(c, 2, axis=1))
    assert same < diff  # aligned assignments score better
    assert cluster_loss(c, c) == same  # deterministic

    # Brute-force golden: softmax-CE over the 2k assignment columns
    # plus ne = log(k) + Σ p·log p per view.
    k = c.shape[1]

    def neg_ent(m):
        p = m.sum(axis=0) / m.sum()
        return math.log(k) + float((p * np.log(p)).sum())

    cols = np.concatenate([c.T, c.T], axis=0)
    cn = cols / np.maximum(np.linalg.norm(cols, axis=1, keepdims=True), 1e-12)
    sim = cn @ cn.T
    total = 0.0
    for r in range(2 * k):
        pos_c = r + k if r < k else r - k
        negs = [x for x in range(2 * k) if x != r and x != pos_c]
        logits = np.array([sim[r, pos_c]] + [sim[r, x] for x in negs])
        p = np.exp(logits - logits.max())
        total += -np.log(p[0] / p.sum())
    want = total / (2 * k) + 2 * neg_ent(c)
    assert same == pytest.approx(want, rel=1e-12)


def test_dropout_train_time_regularizes(xdata):
    """L3 train-time dropout: a dropout>0 run diverges from the p=0 run
    (masks actually applied), stays deterministic for a fixed seed, and
    eval/val scoring is dropout-free (identity at eval)."""
    base = {"lr": 3e-3, "l2_lambda": 1e-7, "batch_size": 40, "epochs": 4,
            "hidden": 8, "dropout": 0.0}
    drop = dict(base, dropout=0.4)
    p0, l0, _ = train_ae_numpy(xdata, None, base, seed=11)
    pd1, ld1, _ = train_ae_numpy(xdata, None, drop, seed=11)
    pd2, ld2, _ = train_ae_numpy(xdata, None, drop, seed=11)
    assert ld1 == ld2  # deterministic under fixed seed
    for k in pd1:
        np.testing.assert_array_equal(pd1[k], pd2[k])
    assert ld1 != l0  # dropout changed the trajectory
    # eval-mode forward of the trained dropout model is mask-free:
    # the same params give the same val loss on repeated evaluation
    _, _, v1 = train_ae_numpy(xdata[:80], xdata[80:], drop, seed=11)
    _, _, v2 = train_ae_numpy(xdata[:80], xdata[80:], drop, seed=11)
    assert v1 == v2 and np.isfinite(v1)


def test_objective_cv_dropout_partition_independent(spark):
    """cv losses with dropout>0 are bit-identical across repartitionings
    (md5-derived per (seed, epoch, batch) masks, O6 discipline)."""
    e = table(spark, SF_SMOKE, "embeddings").limit(200)
    hyper = {"lr": 3e-3, "l2_lambda": 1e-7, "batch_size": 32, "epochs": 2,
             "hidden": 8, "dropout": 0.2}
    r1 = objective_cv(e, hyper=hyper, n_folds=3).collect()
    r2 = objective_cv(e.repartition(17), hyper=hyper, n_folds=3).collect()
    assert [r["val_loss"] for r in r1] == [r["val_loss"] for r in r2]
    assert [r["last_train_loss"] for r in r1] == [r["last_train_loss"] for r in r2]


def test_tpe_primary_path(spark):
    """O1 primary path: random_search's default ("auto") routes
    through a seeded TPE study — Optuna's when installed, the
    vendored operators/tpe.py implementation otherwise (r10: the
    container has no optuna, so the vendored branch is what executes
    here and the former importorskip no longer skips). 3 trials,
    finite losses, reproducible across two runs."""
    from ae_data_integration_spark.tables import table
    from tests.conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "embeddings").limit(150)
    r1 = random_search(e, n_trials=3, n_folds=2)
    r2 = random_search(e, n_trials=3, n_folds=2)
    assert len(r1) == 3
    assert all(np.isfinite(v) and v > 0 for _, _, v in r1)
    assert [(n, v) for n, _, v in r1] == [(n, v) for n, _, v in r2]
    # params come from the declared search space
    for _, p, _ in r1:
        assert 1e-4 <= p["lr"] <= 1e-2
        assert p["batch_size"] in SEARCH_SPACE["batch_size"]
        assert p["dropout"] in SEARCH_SPACE["dropout"]


def test_optuna_branch_executes_with_minimal_tpe_stub(spark, monkeypatch):
    """Runtime coverage for the optuna import branch (random_search's
    TPE leg) WITHOUT optuna installed: a minimal in-memory module that
    honors the exact optuna surface the branch touches —
    create_study(direction, sampler=TPESampler(seed)), study.optimize
    calling the objective with trial objects exposing suggest_float
    (log-scale), suggest_categorical, .number, and study.trials
    carrying (number, params, value). A deterministic md5-seeded
    suggester stands in for TPE: the contract under test is the
    integration wiring (objective construction, SEARCH_SPACE plumbing,
    seeded-sampler instantiation, trial collection), not the sampler's
    statistics."""
    import hashlib
    import math
    import sys
    import types

    calls = {"sampler_seeds": []}

    class _Trial:
        def __init__(self, number):
            self.number = number
            self.params = {}
            self.value = None

        def _u(self, name):
            h = hashlib.md5(f"stub:{self.number}:{name}".encode()).hexdigest()
            return int(h[:12], 16) / float(1 << 48)

        def suggest_float(self, name, lo, hi, log=False):
            u = self._u(name)
            v = (
                math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
                if log
                else lo + u * (hi - lo)
            )
            self.params[name] = v
            return v

        def suggest_categorical(self, name, choices):
            v = choices[int(self._u(name) * len(choices)) % len(choices)]
            self.params[name] = v
            return v

    class _Study:
        def __init__(self):
            self.trials = []

        def optimize(self, objective, n_trials):
            for i in range(n_trials):
                t = _Trial(i)
                t.value = objective(t)
                self.trials.append(t)

    fake = types.ModuleType("optuna")
    fake.samplers = types.SimpleNamespace(
        TPESampler=lambda seed: calls["sampler_seeds"].append(seed)
    )
    fake.create_study = lambda direction, sampler: _Study()
    monkeypatch.setitem(sys.modules, "optuna", fake)

    e = table(spark, SF_SMOKE, "embeddings").limit(150)
    r1 = random_search(e, n_trials=2, n_folds=2)
    r2 = random_search(e, n_trials=2, n_folds=2)

    # Routed through the study (not the md5 fallback): seeded sampler
    # built with the reference's seed 21, trials carry suggested params.
    assert calls["sampler_seeds"] == [21, 21]
    assert [n for n, _, _ in r1] == [0, 1]
    for _, params, value in r1:
        assert set(params) == {"lr", "l2_lambda", "batch_size", "epochs", "hidden"}
        assert 1e-4 <= params["lr"] <= 1e-2
        assert np.isfinite(value) and value > 0
    # Deterministic end to end (stub suggester + md5 fold seeds).
    assert [(n, v) for n, _, v in r1] == [(n, v) for n, _, v in r2]
