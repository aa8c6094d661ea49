"""Property test: the Held-Karp assignment DP in the Munkres semantic
contract (catalog/metrics_q._check_munkres_vs_bruteforce) equals the
exhaustive optimum on random contingency tables — including the
rectangular cases (more preds than labels and vice versa) where the
old permutations enumeration raised or exploded factorially."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st


def _dp_optimum(ct: dict, labels: list, preds: list) -> int:
    """Mirror of the DP inside _check_munkres_vs_bruteforce (kept in
    sync by the exhaustive cross-check below and the parity harness
    which runs the real one against scipy every round)."""
    k = len(preds)
    dp = [0] * (1 << k)
    for lab in labels:
        ndp = dp[:]
        for mask in range(1 << k):
            base = dp[mask]
            for j in range(k):
                bit = 1 << j
                if not mask & bit:
                    v = base + ct.get((lab, preds[j]), 0)
                    if v > ndp[mask | bit]:
                        ndp[mask | bit] = v
        dp = ndp
    return max(dp)


def _brute_optimum(ct: dict, labels: list, preds: list) -> int:
    m = min(len(labels), len(preds))
    best = 0
    for sub in itertools.combinations(labels, m):
        for perm in itertools.permutations(preds, m):
            best = max(best, sum(ct.get((l, p), 0) for l, p in zip(sub, perm)))
    return best


@settings(max_examples=200, deadline=None)
@given(
    n_lab=st.integers(1, 5),
    n_pred=st.integers(1, 6),
    data=st.data(),
)
def test_dp_equals_exhaustive_assignment_optimum(n_lab, n_pred, data):
    labels = list(range(n_lab))
    preds = list(range(n_pred))
    ct = {
        (l, p): data.draw(st.integers(0, 9), label=f"ct[{l},{p}]")
        for l in labels
        for p in preds
        if data.draw(st.booleans(), label=f"has[{l},{p}]")
    }
    assert _dp_optimum(ct, labels, preds) == _brute_optimum(ct, labels, preds)


def test_dp_matches_engine_hungarian_square():
    import numpy as np

    from ae_data_integration_spark.operators.metrics import _hungarian_max

    rng = np.random.default_rng(7)
    for _ in range(50):
        k = int(rng.integers(1, 7))
        w = rng.integers(0, 50, (k, k))
        ct = {(i, j): int(w[i, j]) for i in range(k) for j in range(k)}
        matched = int(sum(w[i, j] for i, j in _hungarian_max(w.astype(float))))
        assert _dp_optimum(ct, list(range(k)), list(range(k))) == matched
