"""DBSCAN (SURVEY §2.8 C2 — instantiated in the reference,
mocss.py:410, no MLlib counterpart).

Distributed formulation:

1. ε-neighbor pairs. Exact variant joins all pairs (used here at
   fixture scale); the scale path prunes candidates with an LSH /
   grid bucket join first (operators/similarity.py shows the
   bucketing machinery) — DBSCAN correctness then needs bucket
   radius ≥ ε so no true neighbor pair is missed.
2. Core points: neighbor count ≥ min_pts (self included, sklearn
   convention).
3. Clusters = connected components of the core-core neighbor graph,
   via iterative min-label propagation (each pass joins labels across
   edges and keeps the minimum; O(log diameter) passes). Border
   points attach to the min core label among their neighbors; others
   are noise (-1).

Deterministic: labels are min point-ids, no randomness anywhere.
Golden-tested against a brute-force numpy DBSCAN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dbscan(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1.0,
    min_pts: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Returns (id, cluster) with cluster = min core-point id of the
    component, or -1 for noise."""
    pts = df.select(F.col(key_col).alias("id"), to_double(vec_col).alias("vec"))
    a = pts.select(F.col("id").alias("ia"), F.col("vec").alias("va"))
    b = pts.select(F.col("id").alias("ib"), F.col("vec").alias("vb"))
    # ε-pairs (exact all-pairs variant; see module docstring for the
    # bucketed scale path). Self-pairs included for the core count.
    pairs = (
        a.join(b, F.col("ia") <= F.col("ib"))
        .filter(_sq_dist("va", "vb") <= F.lit(eps * eps))
        .select("ia", "ib")
    )
    sym = pairs.union(
        pairs.filter(F.col("ia") != F.col("ib")).select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib")
        )
    ).persist()

    deg = sym.groupBy("ia").agg(F.count(F.lit(1)).alias("n_nb"))
    core = deg.filter(F.col("n_nb") >= min_pts).select(F.col("ia").alias("id"))

    core_edges = (
        sym.join(core.select(F.col("id").alias("ia")), "ia")
        .join(core.select(F.col("id").alias("ib")), "ib")
        .persist()
    )

    # Min-label propagation over core-core edges.
    labels = core.select("id", F.col("id").alias("lbl"))
    for _ in range(max_iter):
        nb_min = (
            core_edges.join(labels, core_edges.ib == labels.id)
            .groupBy("ia")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        new_labels = (
            labels.join(nb_min, labels.id == nb_min.ia, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))).alias("lbl"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels.persist()
        if changed == 0:
            break

    # Border points: non-core with a core neighbor -> min core label.
    core_labels = labels.select(F.col("id").alias("cid"), "lbl")
    border = (
        sym.join(core_labels, sym.ib == core_labels.cid)
        .join(core.select(F.col("id").alias("ia")), "ia", "left_anti")
        .groupBy("ia")
        .agg(F.min("lbl").alias("lbl"))
        .select(F.col("ia").alias("id"), "lbl")
    )

    assigned = labels.unionByName(border)
    return (
        pts.select("id")
        .join(assigned, "id", "left")
        .select("id", F.coalesce(F.col("lbl"), F.lit(-1)).alias("cluster"))
    )
