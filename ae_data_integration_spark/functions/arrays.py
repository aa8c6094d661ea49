"""Array (vector) math as Spark higher-order functions.

This is the engine's replacement for the reference's numpy/torch
row-wise linear algebra (SURVEY §2.4 N2, §2.5 J1/J3/J4, §2.7 A1-A5):
every expression here stays JVM-side inside whole-stage codegen — no
Python in the hot path. All folds over an array are sequential
left-folds, so results are bit-deterministic regardless of
partitioning (unlike a groupBy sum over doubles).

Citations into /root/reference:
- L2 row normalization: Simulation_Models/CNC_AE_model_selection.py:219-225
- per-subject recon loss: Evaluation_Auxiliary/reconloss_from_retrained_models.py:45,69-72
- mean-of-shared fusion: Evaluation_Auxiliary/embedding_from_retrained_models.py:73-84
- orthogonality losses: Simulation_Models/JISAE-O1_selection.py:281-293 (and O2/O3)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(arr: Column | str) -> Column:
    """Cast array<float> -> array<double> (exact per-element cast)."""
    return F.transform(arr, lambda x: x.cast("double"))


def asum(arr: Column | str) -> Column:
    """Sequential left-fold sum of an array<double> — deterministic."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    """Row-wise dot product (torch.matmul diag analogue, L6/L7)."""
    return asum(F.zip_with(a, b, lambda x, y: x * y))


def sq_l2(arr: Column | str) -> Column:
    return asum(F.transform(arr, lambda x: x * x))


def l2_norm(arr: Column | str) -> Column:
    return F.sqrt(sq_l2(arr))


def l2_normalize(arr: Column | str) -> Column:
    """Row L2-normalize: F.normalize(x, p=2, dim=1) parity (N2).

    torch clamps the denominator at eps=1e-12; mirror that.
    """
    nrm = F.greatest(l2_norm(arr), F.lit(1e-12))
    return F.transform(arr, lambda x: x / nrm)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<double> columns (L9)."""
    denom = F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))
    return dot(a, b) / denom


def _unrolled_fold(terms: list[Column]) -> Column:
    from functools import reduce

    return reduce(lambda acc, t: acc + t, terms, F.lit(0.0))


def dot_unrolled(a: Column | str, b: Column | str, d: int) -> Column:
    """Same left-fold float order as ``dot`` but as a static
    ((0+t0)+t1)+... expression over element_at terms. Interpreted HOF
    lambdas cost ~1 µs/element inside join residuals and filters; the
    unrolled form compiles into whole-stage codegen (~20x on wide
    candidate joins) and is bit-identical (identical association
    order). Use whenever the vector width is known at plan time —
    which in this engine is always (schema-fixed embedding columns).

    For string refs the tree is built as ONE SQL-text expr: a d-term
    Column chain costs ~7ms/term of py4j round-trips at plan-build
    time (measured 429 ms at d=64 — it dominated _pq_serve's 0.8 s
    plan construction), while the parser builds the IDENTICAL tree
    from text in <1 ms. SQL `+`/`*` are left-associative, `0.0D` is
    the double literal, so the fold order — hence every bit of the
    result — is unchanged."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            "0.0D" + "".join(
                f" + element_at({a}, {i})*element_at({b}, {i})"
                for i in range(1, d + 1)
            )
        )
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _unrolled_fold(
        [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(d)]
    )


def sq_l2_unrolled(arr: Column | str, d: int) -> Column:
    if isinstance(arr, str):
        return dot_unrolled(arr, arr, d)
    arr = F.col(arr) if isinstance(arr, str) else arr
    return _unrolled_fold(
        [F.element_at(arr, i + 1) * F.element_at(arr, i + 1) for i in range(d)]
    )


def cosine_unrolled(a: Column | str, b: Column | str, d: int) -> Column:
    """Codegen-friendly cosine — bit-identical to ``cosine`` (same
    fold order, same eps clamp), ~20x faster in join residuals."""
    denom = F.greatest(
        F.sqrt(sq_l2_unrolled(a, d)) * F.sqrt(sq_l2_unrolled(b, d)),
        F.lit(1e-12),
    )
    return dot_unrolled(a, b, d) / denom


def recon_loss_row(x: Column | str, xhat: Column | str) -> Column:
    """Per-row reconstruction loss sqrt(sum((xhat-x)^2)) (A2)."""
    return F.sqrt(asum(F.zip_with(x, xhat, lambda a, b: (a - b) * (a - b))))


def mean_fuse(a: Column | str, b: Column | str) -> Column:
    """(view1_shared + view2_shared)/2 elementwise (J4)."""
    return F.zip_with(a, b, lambda x, y: (x + y) / F.lit(2.0))


def concat_views(*arrs: Column | str) -> Column:
    """Horizontal concat of aligned views, torch.cat(dim=1) (J1/J3)."""
    return F.concat(*arrs)


def minmax_scale(arr: Column | str) -> Column:
    """Row-local min-max scale of an array (the per-feature variant
    lives in operators.scale, computed with groupBy aggregates)."""
    lo, hi = F.array_min(arr), F.array_max(arr)
    return F.transform(arr, lambda x: (x - lo) / F.greatest(hi - lo, F.lit(1e-12)))


def slice_features(arr: Column | str, start: int, length: int) -> Column:
    """Column-range slice train[:, a:b] (P7). 1-based start."""
    return F.slice(arr, start, length)
