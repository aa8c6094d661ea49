"""CCA loss (SURVEY §2.7 A9, §2.6 L8).

The reference imports a CCA objective (Simulation_Auxiliary/
objectives.py:11-90: regularized within-view covariances, inverse
square roots via eigendecomposition, then the sum of the top-k
singular values of T = Σ11^(-1/2) Σ12 Σ22^(-1/2)) but never calls it
from the 8 pipelines. The engine ships it anyway: covariances are
DISTRIBUTED (fixed-point cross-product aggregates over exploded
pairs — the only O(N) part), and the k×k eigen work runs driver-side
in numpy (L8), since k is the embedding width, never large.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import Q30, fpsum


def _cross_products(df: DataFrame, a_col: str, b_col: str) -> np.ndarray:
    """Distributed Σ aᵢ bᵢᵀ via posexplode pairs + fixed-point sums;
    collects only da×db aggregate cells."""
    pairs = df.select(
        F.posexplode(a_col).alias("i", "x"),
        F.col(b_col).alias("_b"),
    ).select("i", "x", F.posexplode("_b").alias("j", "y"))
    cells = (
        pairs.groupBy("i", "j")
        .agg(fpsum(F.col("x") * F.col("y"), Q30).alias("s"))
        .collect()
    )
    di = max(c["i"] for c in cells) + 1
    dj = max(c["j"] for c in cells) + 1
    m = np.zeros((di, dj))
    for c in cells:
        m[c["i"], c["j"]] = c["s"]
    return m


def cca_loss(
    df: DataFrame,
    v1_col: str = "features_v1",
    v2_col: str = "features_v2",
    out_dim: int | None = None,
    reg: float = 1e-4,
) -> float:
    """Negative sum of the top-k canonical correlations.

    Mean-centering + covariance assembly distributed; eigh on k×k
    driver-side (ref objectives.py:46-47,86 torch.linalg.eigh).
    Covariances use the reference's unbiased 1/(m-1) convention with
    r1 = r2 = 1e-4 ridge (ref objectives.py:36-40)."""
    n = df.count()
    mu1 = np.array(
        df.agg(
            *[
                (fpsum(F.element_at(v1_col, i + 1), Q30) / F.lit(float(n))).alias(f"m{i}")
                for i in range(len(df.select(v1_col).first()[0]))
            ]
        ).first()
    )
    d1 = len(mu1)
    mu2 = np.array(
        df.agg(
            *[
                (fpsum(F.element_at(v2_col, i + 1), Q30) / F.lit(float(n))).alias(f"m{i}")
                for i in range(len(df.select(v2_col).first()[0]))
            ]
        ).first()
    )
    s11 = (_cross_products(df, v1_col, v1_col) - n * np.outer(mu1, mu1)) / (n - 1)
    s22 = (_cross_products(df, v2_col, v2_col) - n * np.outer(mu2, mu2)) / (n - 1)
    s12 = (_cross_products(df, v1_col, v2_col) - n * np.outer(mu1, mu2)) / (n - 1)
    s11 += reg * np.eye(d1)
    s22 += reg * np.eye(len(mu2))

    def inv_sqrt(m: np.ndarray) -> np.ndarray:
        w, v = np.linalg.eigh(m)  # L8
        w = np.maximum(w, 1e-12)
        return v @ np.diag(w**-0.5) @ v.T

    t = inv_sqrt(s11) @ s12 @ inv_sqrt(s22)
    sv = np.linalg.svd(t, compute_uv=False)
    k = out_dim or min(t.shape)
    return float(-np.sort(sv)[::-1][:k].sum())


def covariance_cells(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed covariance matrix as (i, j, cov) cells — the O(N)
    half of PCA (C7/L8), exposed as an oracle-able DataFrame.

    Same math as pca_project's covariance assembly: fixed-point
    cross-product sums (partition-order independent, engine-portable)
    plus fixed-point per-dim means, combined as
    (Σxy − n·μᵢ·μⱼ)/(n−1). The shuffle carries only d² aggregate
    cells thanks to map-side partial aggregation; the scan-side
    explode is d² per row, the price of exact portable sums (the
    non-oracle scale path would accumulate per-partition Gram
    matrices in Arrow batches instead).
    """
    pts = df.select(
        F.col(key_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    long = pts.select(F.posexplode("v").alias("i", "x"))
    mu = long.groupBy("i").agg(
        (fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    pairs = pts.select(
        F.posexplode("v").alias("i", "x"), F.col("v").alias("_b")
    ).select("i", "x", F.posexplode("_b").alias("j", "y"))
    cross = pairs.groupBy("i", "j").agg(
        fpsum(F.col("x") * F.col("y"), Q30).alias("cp")
    )
    mi = mu.select(F.col("i"), F.col("mu").alias("mu_i"), "n")
    mj = mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    return (
        cross.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            # posexplode yields int32; the oracle's generate_subscripts
            # is int64 and the driver's schema compare is type-strict
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (
                (F.col("cp") - F.col("n").cast("double") * F.col("mu_i") * F.col("mu_j"))
                / (F.col("n") - F.lit(1)).cast("double")
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def pca_literals(
    cov: np.ndarray, n_components: int, decimals: int = 9
) -> np.ndarray:
    """Top-k eigenvectors of ``cov`` as a d×k literal matrix, with the
    deterministic sign convention (largest-|coeff| entry positive) and
    rounded to ``decimals`` decimals.

    Shared by the Spark plan builder AND the SQL-oracle generator for
    the oracled projection query: both sides derive their covariance
    through the SAME fixed-point aggregation (bit-identical across
    engines, proven by the c7_pca_covariance value hash), call eigh on
    the identical matrix in the same process, and round through this
    one function — so the embedded literals are equal and the
    projection arithmetic (identical left-fold order) is bit-exact.
    The rounding absorbs any low-bit eigh jitter between calls."""
    _, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :n_components].copy()
    for j in range(comps.shape[1]):
        if comps[np.abs(comps[:, j]).argmax(), j] < 0:
            comps[:, j] = -comps[:, j]
    return np.round(comps, decimals)


def pca_project(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 2,
) -> DataFrame:
    """C7 substitute: distributed PCA projection.

    The reference's C7 is t-SNE, used only to draw 2-d scatter plots
    (mocss.py TSNE(...).fit_transform); t-SNE is inherently
    all-pairs-iterative and not a data-processing operator. The
    engine's projection-to-2d twin is PCA: covariance assembled
    DISTRIBUTED (same fixed-point cross-product aggregates as
    cca_loss — the only O(N) work), eigh on the d×d matrix driver-
    side (L8, d = embedding width), then the projection applied as a
    broadcast matrix literal — one narrow pass, no shuffle beyond the
    d×d aggregation.

    Deterministic sign convention: each component is flipped so its
    largest-|coefficient| entry is positive (eigenvector sign is
    otherwise arbitrary).
    """
    pts = df.select(F.col(key_col).alias("id"), F.col(vec_col).alias("_v"))
    pts = pts.select(
        "id", F.transform("_v", lambda x: x.cast("double")).alias("vec")
    )
    n = pts.count()
    first = pts.select("vec").first()
    if n == 0 or first is None or first[0] is None:
        # Empty input: emit an empty (id, pc1..pck) frame with the
        # right schema instead of crashing on first()[0].
        return pts.select(
            "id",
            *[
                F.lit(None).cast("double").alias(f"pc{j + 1}")
                for j in range(n_components)
            ],
        ).limit(0)
    d = len(first[0])
    mu = np.array(
        pts.agg(
            *[
                (fpsum(F.element_at("vec", i + 1), Q30) / F.lit(float(n))).alias(f"m{i}")
                for i in range(d)
            ]
        ).first()
    )
    cov = (
        _cross_products(pts.select("id", F.col("vec").alias("v")), "v", "v")
        - n * np.outer(mu, mu)
    ) / max(n - 1, 1)
    w, v = np.linalg.eigh(cov)  # L8; ascending eigenvalues
    comps = v[:, ::-1][:, :n_components]  # top components, d×k
    for j in range(comps.shape[1]):
        if comps[np.abs(comps[:, j]).argmax(), j] < 0:
            comps[:, j] = -comps[:, j]

    # Projection as literal arithmetic: y_j = Σ_i (x_i − μ_i)·C_ij —
    # a codegen'd expression per output dim, zero Python in the pass.
    out_cols = [
        sum(
            ((F.element_at("vec", i + 1) - F.lit(float(mu[i]))) * F.lit(float(comps[i, j])))
            for i in range(d)
        ).alias(f"pc{j + 1}")
        for j in range(comps.shape[1])
    ]
    return pts.select("id", *out_cols)
