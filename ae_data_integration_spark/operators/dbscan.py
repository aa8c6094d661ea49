"""DBSCAN (SURVEY §2.8 C2 — instantiated in the reference,
mocss.py:410, no MLlib counterpart).

Distributed formulation:

1. ε-neighbor candidate pairs via a GRID-BUCKET join (the scale
   path, default): each point is assigned to a cell of side ε in a
   low-dimensional projection (the ``grid_dims`` highest-variance
   coordinates — |projected difference| ≤ true distance, so any true
   ε-pair lands in the same or an adjacent projected cell and no
   neighbor pair is ever missed). One join side is replicated to its
   3^grid_dims adjacent cells, the other stays in its home cell, so
   the equi-join emits each ordered candidate pair exactly once;
   the exact ε predicate then filters candidates. ``exact=True``
   falls back to the all-pairs theta join (fixture-scale
   cross-check only).
2. Core points: neighbor count ≥ min_pts (self included, sklearn
   convention).
3. Clusters = connected components of the core-core neighbor graph,
   via iterative min-label propagation. Each pass advances labels one
   hop, so convergence takes O(graph diameter) passes — fine for the
   compact ε-balls DBSCAN produces; a warning is raised if the loop
   exits at max_iter without converging (labels would be split).
   Border points attach to the min core label among their neighbors;
   others are noise (-1).

Deterministic: labels are min point-ids, no randomness anywhere.
Golden-tested against a brute-force numpy DBSCAN.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _top_variance_dims(pts: DataFrame, d: int, k: int) -> list[int]:
    """0-based indices of the k highest-variance coordinates, from one
    map-side-combined agg (no explode shuffle)."""
    row = pts.agg(
        *[F.var_pop(F.element_at("vec", i + 1)).alias(f"v{i}") for i in range(d)]
    ).first()
    order = sorted(range(d), key=lambda i: -(row[f"v{i}"] or 0.0))
    return order[:k]


def candidate_pairs(
    pts: DataFrame,
    eps: float,
    exact: bool = False,
    grid_dims: int = 2,
) -> DataFrame:
    """Ordered (ia, ib) candidate pairs with ia ≤ ib, superset-filtered
    down to true ε-pairs. ``pts`` must have (id, vec) columns."""
    a = pts.select(F.col("id").alias("ia"), F.col("vec").alias("va"))
    b = pts.select(F.col("id").alias("ib"), F.col("vec").alias("vb"))
    head = pts.select("vec").first()
    if exact or head is None or head[0] is None:
        # Exact theta join; also the empty-input path (head is None):
        # the join over zero rows is a no-op and avoids probing a
        # nonexistent first vector for dimensionality.
        cand = a.join(b, F.col("ia") <= F.col("ib"))
    else:
        d = len(head[0])
        p = max(1, min(grid_dims, d))
        dims = _top_variance_dims(pts, d, p)
        cells = pts.select(
            "id", "vec",
            *[
                F.floor(F.element_at("vec", dim + 1) / F.lit(float(eps)))
                .cast("long")
                .alias(f"g{j}")
                for j, dim in enumerate(dims)
            ],
        )
        # a-side replicated to all 3^p adjacent cells; b stays home, so
        # each ordered pair meets in exactly one cell (b's home).
        offsets = [()]
        for _ in range(p):
            offsets = [o + (dx,) for o in offsets for dx in (-1, 0, 1)]
        off_col = F.explode(
            F.array(*[F.struct(*[F.lit(dx).alias(f"d{j}") for j, dx in enumerate(o)]) for o in offsets])
        ).alias("off")
        a_rep = (
            cells.select(F.col("id").alias("ia"), F.col("vec").alias("va"),
                         *[F.col(f"g{j}") for j in range(p)], off_col)
            .select(
                "ia", "va",
                *[(F.col(f"g{j}") + F.col(f"off.d{j}")).alias(f"c{j}") for j in range(p)],
            )
        )
        b_home = cells.select(
            F.col("id").alias("ib"), F.col("vec").alias("vb"),
            *[F.col(f"g{j}").alias(f"c{j}") for j in range(p)],
        )
        cand = a_rep.join(b_home, [f"c{j}" for j in range(p)]).filter(
            F.col("ia") <= F.col("ib")
        )
    return (
        cand.filter(_sq_dist("va", "vb") <= F.lit(eps * eps)).select("ia", "ib")
    )


def dbscan(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1.0,
    min_pts: int = 4,
    max_iter: int = 50,
    exact: bool = False,
    grid_dims: int = 2,
) -> DataFrame:
    """Returns (id, cluster) with cluster = min core-point id of the
    component, or -1 for noise."""
    pts = df.select(F.col(key_col).alias("id"), to_double(vec_col).alias("vec"))
    pairs = candidate_pairs(pts, eps, exact=exact, grid_dims=grid_dims)
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

    # Min-label propagation over core-core edges (one hop per pass).
    # Each pass persists its result and unpersists the previous one —
    # only the frontier generation stays cached, so a 50-pass run
    # holds one labels DataFrame in memory, not 50.
    labels = core.select("id", F.col("id").alias("lbl")).persist()
    changed = 0
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
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )  # materializes new_labels; the old generation is now safe to drop
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed:
        warnings.warn(
            f"dbscan: min-label propagation hit max_iter={max_iter} without "
            "converging; components with diameter > max_iter are split. "
            "Raise max_iter.",
            stacklevel=2,
        )

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
