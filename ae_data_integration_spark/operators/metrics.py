"""Clustering/classification evaluation metrics as DataFrame aggs.

Re-expresses the reference's sklearn metric layer
(Simulation_Auxiliary/evaluation.py:6-53) relationally: every metric
reduces to the contingency table groupBy(label, pred).count(), then
closed-form expressions — deliberately UDF-free so the DuckDB oracle
can verify them (SURVEY §2.8 C3/C4).

NMI follows sklearn's default average_method='arithmetic':
MI / ((H(labels)+H(preds))/2). ARI/FMI use exact integer pair counts
C(n,2); only the logarithms introduce sub-ulp engine variance, so
NMI is rounded to 6 decimals (tagged 'approx' in the catalog).

Munkres-matched accuracy (evaluation.py:34-53) does the Hungarian
assignment driver-side on the k×k contingency matrix (numpy; k is
the class count, never large) — the only deliberate driver-side step.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import Q40


def contingency(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    return df.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n_ij"))


def _pairs(c):
    return (c * (c - F.lit(1))) / F.lit(2)


def cluster_metrics(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """One-row DataFrame: nmi, ari, fmi (sklearn-equivalent formulas).

    Fully lazy: N arrives via a broadcast crossJoin of a one-row
    total, not a driver-side collect.
    """
    ct = contingency(df, label_col, pred_col)
    tot = ct.agg(F.sum("n_ij").cast("double").alias("N"))
    a = ct.groupBy("label").agg(F.sum("n_ij").alias("a_i"))
    b = ct.groupBy("pred").agg(F.sum("n_ij").alias("b_j"))

    joined = (
        ct.join(F.broadcast(a), "label")
        .join(F.broadcast(b), "pred")
        .crossJoin(F.broadcast(tot))
    )
    N = F.col("N")
    mi_term = (F.col("n_ij") / N) * (
        F.log(N * F.col("n_ij") / (F.col("a_i") * F.col("b_j")))
    )
    stats = joined.groupBy("N").agg(
        (F.sum(F.round(mi_term * F.lit(Q40)).cast("long")) / F.lit(float(Q40))).alias("mi"),
        F.sum(_pairs(F.col("n_ij")).cast("decimal(38,6)")).cast("double").alias("sum_nij_pairs"),
    )
    h_u = a.crossJoin(F.broadcast(tot)).agg(
        (F.sum(F.round(-(F.col("a_i") / N) * F.log(F.col("a_i") / N) * F.lit(Q40)).cast("long"))
         / F.lit(float(Q40))).alias("h_u"),
        F.sum(_pairs(F.col("a_i")).cast("decimal(38,6)")).cast("double").alias("sum_ai_pairs"),
    )
    h_v = b.crossJoin(F.broadcast(tot)).agg(
        (F.sum(F.round(-(F.col("b_j") / N) * F.log(F.col("b_j") / N) * F.lit(Q40)).cast("long"))
         / F.lit(float(Q40))).alias("h_v"),
        F.sum(_pairs(F.col("b_j")).cast("decimal(38,6)")).cast("double").alias("sum_bj_pairs"),
    )
    total_pairs = N * (N - F.lit(1.0)) / F.lit(2.0)

    out = stats.crossJoin(h_u).crossJoin(h_v)
    expected = F.col("sum_ai_pairs") * F.col("sum_bj_pairs") / total_pairs
    max_idx = (F.col("sum_ai_pairs") + F.col("sum_bj_pairs")) / F.lit(2.0)
    return out.select(
        F.round(F.col("mi") / ((F.col("h_u") + F.col("h_v")) / F.lit(2.0)), 6).alias("nmi"),
        F.round(
            (F.col("sum_nij_pairs") - expected) / (max_idx - expected), 6
        ).alias("ari"),
        F.round(
            F.col("sum_nij_pairs")
            / F.sqrt(F.col("sum_ai_pairs") * F.col("sum_bj_pairs")),
            6,
        ).alias("fmi"),
    )


def accuracy(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """avg(pred == label) as an exact count ratio."""
    return df.agg(
        (
            F.sum(F.when(F.col(label_col) == F.col(pred_col), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy")
    )


# --- Hungarian assignment (driver-side, k×k) --------------------------------


def _hungarian_max(cost: np.ndarray) -> list[tuple[int, int]]:
    """Maximum-weight assignment on a square matrix via the O(n³)
    Jonker-style shortest augmenting path method (classic public
    algorithm). Returns (row, col) pairs."""
    m = (cost.max() - cost).astype(float)  # minimize
    n = m.shape[0]
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=int)  # p[j] = row matched to column j
    way = np.zeros(n + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, np.inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], np.inf, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = m[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j], way[j] = cur, j0
                    if minv[j] < delta:
                        delta, j1 = minv[j], j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    return [(p[j] - 1, j - 1) for j in range(1, n + 1)]


def munkres_accuracy(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Best-cluster-relabeling accuracy (ref evaluation.py:34-53).

    Contingency via a distributed groupBy; Hungarian on the collected
    k×k matrix; accuracy = matched mass / N. Returns one row.
    """
    ct = contingency(df, label_col, pred_col).collect()
    labels = sorted({r["label"] for r in ct})
    preds = sorted({r["pred"] for r in ct})
    k = max(len(labels), len(preds))
    mat = np.zeros((k, k))
    li = {v: i for i, v in enumerate(labels)}
    pi = {v: i for i, v in enumerate(preds)}
    for r in ct:
        mat[li[r["label"]], pi[r["pred"]]] = r["n_ij"]
    matched = sum(mat[i, j] for i, j in _hungarian_max(mat))
    total = mat.sum()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(matched / total),)], "munkres_accuracy double"
    )
