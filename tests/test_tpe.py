"""Vendored seeded TPE (operators/tpe.py — Bergstra 2011 semantics,
the reference's Optuna TPESampler + MedianPruner(n_warmup_steps=2)
configuration, CNC_AE_model_selection.py:528-534).

Driver-side golden tests: bit-determinism, beats-random on seeded
synthetic objectives (the claim that justifies vendoring at all),
and the median-pruner decision table. The Spark integration
(random_search sampler="auto"/"tpe") is covered in test_train.py.
"""

from __future__ import annotations

import math

import numpy as np

from ae_data_integration_spark.operators.tpe import (
    MedianPruner,
    TPESampler,
    tpe_minimize,
)
from ae_data_integration_spark.operators.train import SEARCH_SPACE, sample_params

SEEDS = (7, 13, 21, 42, 99)


def f_numeric(p: dict) -> float:
    """CV-loss-shaped synthetic objective: smooth log-space bowls on
    the numeric dims (optimum lr=1e-3, l2=10^-6.5), small categorical
    offsets — the surface TPE is built to exploit."""
    return (
        (math.log10(p["lr"]) + 3.0) ** 2
        + (math.log10(p["l2_lambda"]) + 6.5) ** 2
        + 0.2 * (p["batch_size"] != 64)
        + 0.2 * (p["hidden"] != 16)
        + 0.8 * p["dropout"]
    )


def test_tpe_is_deterministic():
    r1 = tpe_minimize(f_numeric, SEARCH_SPACE, n_trials=30, seed=21)
    r2 = tpe_minimize(f_numeric, SEARCH_SPACE, n_trials=30, seed=21)
    assert r1 == r2


def test_tpe_beats_random_search():
    """The vendoring claim: at 50 trials over 5 fixed seeds the TPE
    study's best must beat md5 random search on the mean and on a
    majority of seeds (measured at authoring time: mean 0.075 vs
    0.159, 4/5 wins). Both samplers fully seeded — this is a golden
    comparison, not a flaky statistical one."""
    tpe_best = [
        min(v for _, _, v, _ in tpe_minimize(f_numeric, SEARCH_SPACE, 50, seed=sd))
        for sd in SEEDS
    ]
    rnd_best = [
        min(f_numeric(sample_params(i, f"s{sd}")) for i in range(50))
        for sd in SEEDS
    ]
    assert np.mean(tpe_best) < np.mean(rnd_best)
    assert sum(t < r for t, r in zip(tpe_best, rnd_best)) >= 3


def test_tpe_numeric_refinement():
    """Pure-numeric space: the adaptive-bandwidth Parzen refinement
    must localize a smooth 2-D log bowl well past random's resolution
    (measured means at 50 trials over the 5 seeds: TPE 0.0049 vs
    random 0.0244 — per-seed 0.003-0.007, i.e. variance collapses
    where random's tail stays fat)."""
    space = {"lr": (1e-4, 1e-2, "log"), "l2_lambda": (1e-8, 1e-5, "log")}

    def f2(p):
        return (math.log10(p["lr"]) + 3.0) ** 2 + (
            math.log10(p["l2_lambda"]) + 6.5
        ) ** 2

    bests = [
        min(v for _, _, v, _ in tpe_minimize(f2, space, 50, seed=sd))
        for sd in SEEDS
    ]
    assert np.mean(bests) < 0.01


def test_suggest_respects_domains():
    """Every suggestion (startup and TPE phases) stays inside the
    declared domain — numeric within [lo, hi], categorical a member."""
    sampler = TPESampler(seed=3)
    history: list[tuple[dict, float]] = []
    for t in range(20):
        p = sampler.suggest(SEARCH_SPACE, history)
        assert 1e-4 <= p["lr"] <= 1e-2
        assert 1e-8 <= p["l2_lambda"] <= 1e-5
        assert p["batch_size"] in SEARCH_SPACE["batch_size"]
        assert p["epochs"] in SEARCH_SPACE["epochs"]
        assert p["hidden"] in SEARCH_SPACE["hidden"]
        assert p["dropout"] in SEARCH_SPACE["dropout"]
        history.append((p, f_numeric(p)))


def test_median_pruner_semantics():
    """optuna MedianPruner contract: never prunes before
    n_warmup_steps; at step >= warmup prunes exactly when the
    intermediate value exceeds the median of completed trials'
    intermediates at that step."""
    pr = MedianPruner(n_warmup_steps=2)
    # no completed trials yet -> never prune
    assert not pr.should_prune(5, 1e9)
    pr.report_completed([3.0, 2.0, 1.0])
    pr.report_completed([5.0, 4.0, 3.0])
    # steps 0/1 are warmup regardless of value
    assert not pr.should_prune(0, 1e9)
    assert not pr.should_prune(1, 1e9)
    # step 2 median of (1.0, 3.0) = 2.0
    assert pr.should_prune(2, 2.5)
    assert not pr.should_prune(2, 2.0)  # equal to median: keep
    assert not pr.should_prune(2, 1.5)
    # a step no completed trial reached -> no basis, keep
    assert not pr.should_prune(9, 1e9)


def test_tpe_minimize_prunes_and_excludes_pruned_from_history():
    """Trials whose running fold-mean exceeds the completed median at
    step >= 2 come back PRUNED with their partial value; the study
    still returns one row per trial and replays deterministically.
    The objective alternates a good base (completes) with a bad base
    (pruned at the warmup boundary) so both states are exercised by
    construction, not by sampler luck."""
    calls = {"n": 0}

    def steps(p):
        calls["n"] += 1
        base = 1.0 if calls["n"] % 2 == 1 else 3.0
        return [base + 0.5, base + 0.2, base, base - 0.1, base - 0.2]

    def run():
        calls["n"] = 0
        return tpe_minimize(
            steps, SEARCH_SPACE, n_trials=10, seed=7,
            pruner=MedianPruner(n_warmup_steps=2),
        )

    rs = run()
    states = [s for *_, s in rs]
    assert len(rs) == 10
    # trial 0 completes (no pruning basis yet); every bad-base trial
    # after it exceeds the completed median at step 2 and is pruned
    assert states[0] == "COMPLETE"
    assert states.count("PRUNED") == 5 and states.count("COMPLETE") == 5
    # pruned value = running mean at the prune step (base+0.5, +0.2,
    # base averaged = base + 7/30)
    pruned_vals = [v for _, _, v, s in rs if s == "PRUNED"]
    assert all(abs(v - (3.0 + 0.7 / 3.0)) < 1e-12 for v in pruned_vals)
    assert all(np.isfinite(v) for _, _, v, _ in rs)
    assert rs == run()
