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
from ae_data_integration_spark.functions.caching import persist_tracked, track


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_dist_unrolled(a, b, d: int):
    """Same left-fold float order as _sq_dist, but as a static
    ((0+t0)+t1)+... expression over element_at terms — straight-line
    arithmetic inside WholeStageCodegen instead of an interpreted
    per-element lambda (~20x on wide candidate filters). Bit-identical
    result: Python reduce(+) builds the identical left association."""
    from functools import reduce

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    terms = [
        (F.element_at(a, i + 1) - F.element_at(b, i + 1))
        * (F.element_at(a, i + 1) - F.element_at(b, i + 1))
        for i in range(d)
    ]
    return reduce(lambda acc, t: acc + t, terms, F.lit(0.0))


def _top_variance_dims(pts: DataFrame, d: int, k: int) -> list[int]:
    """0-based indices of the k highest-variance coordinates, from one
    map-side-combined agg (no explode shuffle)."""
    row = pts.agg(
        *[F.var_pop(F.element_at("vec", i + 1)).alias(f"v{i}") for i in range(d)]
    ).first()
    order = sorted(range(d), key=lambda i: -(row[f"v{i}"] or 0.0))
    return order[:k]


_PREFLIGHT_CACHE: dict[tuple, tuple[list[int], float]] = {}


def _grid_preflight(
    pts: DataFrame, eps: float, p: int, sample_n: int = 4096
) -> tuple[list[int], float]:
    """Sample-driven planning stats for the ε-join (one small collect,
    numpy locally — the AQE-style alternative to full-data stat aggs,
    which cost more than the join they'd optimize on small-k plans):

    returns (top-variance dims, estimated fraction of all pairs the
    grid join would still examine). The choice only steers the
    physical strategy — every path applies the exact ε predicate —
    so a sampling error can cost time, never correctness.

    The sample is an md5-ranked top-k (TakeOrdered: per-partition
    heap + driver merge, no full sort) — uniform over the whole
    input, unlike a limit() partition-prefix, which on spatially
    sorted data would bias the cell-occupancy estimate toward one
    region and misroute the join strategy."""
    import itertools
    from collections import Counter

    import numpy as np

    from ae_data_integration_spark.functions.hashing import md5_rank

    # planning stats are deterministic per (input files, eps, p) —
    # cache them so repeated plan builds (bench reps, pipelines that
    # cluster the same table twice) pay the sampling job once
    try:
        files = tuple(sorted(pts.inputFiles()))
    except Exception:  # noqa: BLE001
        files = ()
    key = (files, float(eps), int(p), int(sample_n))
    if files and key in _PREFLIGHT_CACHE:
        return _PREFLIGHT_CACHE[key]

    rows = (
        pts.select("vec", md5_rank("id", salt="dbscan-preflight:").alias("_rk"))
        .orderBy("_rk")
        .limit(sample_n)
        .collect()
    )
    x = np.asarray([r["vec"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or not len(x):
        return list(range(p)), 1.0
    dims = np.argsort(-x.var(axis=0))[:p].tolist()
    cells = Counter(
        map(tuple, np.floor(x[:, dims] / float(eps)).astype(np.int64).tolist())
    )
    cand = 0
    for c, n in cells.items():
        for off in itertools.product((-1, 0, 1), repeat=len(dims)):
            cand += n * cells.get(tuple(a + b for a, b in zip(c, off)), 0)
    out = (dims, cand / float(len(x)) ** 2)
    if files:
        _PREFLIGHT_CACHE[key] = out
    return out


def _eps_pairs_blocked(pts: DataFrame, eps: float, n_blocks: int = 16) -> DataFrame:
    """All-pairs ε-join via BLOCKED Arrow/numpy distance kernels.

    When no projection can prune (isotropic high-dim data — distance
    concentration), an exact ε-join must examine ~all pairs; the cost
    then is per-pair arithmetic. Interpreted per-pair array HOFs run
    ~100ns/element; a vectorized numpy kernel over block pairs is
    ~100× faster. Points hash into n_blocks blocks, each block packs
    into one row, the B(B+1)/2 block pairs fan out as tasks, and each
    task computes its dense distance sub-matrix vectorized — the
    standard distributed blocked all-pairs. Size n_blocks so a block
    (rows/n_blocks × d doubles) stays ~tens of MB at the target SF.

    Emits ordered (ia, ib) with ia ≤ ib, exact ε predicate. Float
    caveat: numpy's axis-sum uses pairwise summation while the
    per-pair path's F.aggregate is a strict sequential fold, so a
    pair whose distance sits within an ulp of ε can classify
    differently between the two paths; agreement is exact only up to
    that rounding-order difference.
    """
    import numpy as np
    import pandas as pd

    packed = (
        pts.select(F.pmod(F.col("id"), F.lit(n_blocks)).alias("blk"), "id", "vec")
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "vec")).alias("rows"))
    )
    l = packed.select(F.col("blk").alias("ba"), F.col("rows").alias("ra"))
    r = packed.select(F.col("blk").alias("bb"), F.col("rows").alias("rb"))
    block_pairs = l.join(r, F.col("ba") <= F.col("bb"))
    eps2 = float(eps * eps)

    def kern(pdfs):
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ids_a = np.array([x["id"] for x in row["ra"]], dtype=np.int64)
                va = np.stack([np.asarray(x["vec"], dtype=np.float64) for x in row["ra"]])
                ids_b = np.array([x["id"] for x in row["rb"]], dtype=np.int64)
                vb = np.stack([np.asarray(x["vec"], dtype=np.float64) for x in row["rb"]])
                d2 = ((va[:, None, :] - vb[None, :, :]) ** 2).sum(-1)
                ii, jj = np.where(d2 <= eps2)
                ia, ib = ids_a[ii], ids_b[jj]
                if row["ba"] == row["bb"]:
                    # diagonal block: the dense matrix holds both
                    # orderings of each pair — keep one (plus self).
                    keep = ia <= ib
                    ia, ib = ia[keep], ib[keep]
                # cross block pair: each unordered pair meets exactly
                # once — keep all, normalize the ordering.
                lo = np.minimum(ia, ib)
                hi = np.maximum(ia, ib)
                if not len(lo):
                    continue
                yield pd.DataFrame({"ia": lo, "ib": hi})

    return block_pairs.mapInPandas(kern, "ia long, ib long")


def candidate_pairs(
    pts: DataFrame,
    eps: float,
    exact: bool = False,
    grid_dims: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Ordered (ia, ib) candidate pairs with ia ≤ ib, superset-filtered
    down to true ε-pairs. ``pts`` must have (id, vec) columns.

    ``portable=True`` (default) forbids the blocked-numpy fallback:
    numpy's pairwise axis-sum can classify a pair within an ulp of ε
    differently from the sequential left fold a SQL oracle evaluates,
    so oracled catalog queries must stay on the grid/theta paths whose
    ε predicate is the fold-exact expression. Set ``portable=False``
    to allow the vectorized kernel when the grid degenerates
    (isotropic high-dim data) and no cross-engine replay is needed."""
    a = pts.select(F.col("id").alias("ia"), F.col("vec").alias("va"))
    b = pts.select(F.col("id").alias("ib"), F.col("vec").alias("vb"))
    head = pts.select("vec").first()
    use_grid = not (exact or head is None or head[0] is None)
    if use_grid:
        d = len(head[0])
        p = max(1, min(grid_dims, d))
        # Degeneracy check: grid pruning only works when the projection
        # actually separates points into many ε-cells. On isotropic
        # high-dim data (distance concentration) almost everything
        # lands in a handful of cells and the grid join degenerates to
        # all-pairs WITH 3^p replication overhead on top. A sampled
        # occupancy estimate decides; the blocked vectorized ε-join
        # wins when the grid would examine ≥ half of all pairs anyway.
        dims, cand_frac = _grid_preflight(pts, eps, p)
        if cand_frac >= 0.5:
            use_grid = False
    if not use_grid:
        if exact or portable or head is None or head[0] is None:
            # Literal theta join: the fixture-scale cross-check path,
            # the empty-input no-op, and the portable fallback when
            # the grid degenerates (keeps the fold-exact ε predicate).
            cand = a.join(b, F.col("ia") <= F.col("ib"))
        else:
            # Grid degenerate but data non-trivial: blocked numpy
            # ε-join (already exact — no re-filter needed).
            return _eps_pairs_blocked(pts, eps)
    else:
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
    d_known = len(head[0]) if head is not None and head[0] is not None else None
    sqd = (
        _sq_dist_unrolled("va", "vb", d_known)
        if d_known is not None
        else _sq_dist("va", "vb")
    )
    return cand.filter(sqd <= F.lit(eps * eps)).select("ia", "ib")


def dbscan(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1.0,
    min_pts: int = 4,
    max_iter: int = 50,
    exact: bool = False,
    grid_dims: int = 2,
    driver_cc_max_edges: int = 500_000,
    portable: bool = False,
) -> DataFrame:
    """Returns (id, cluster) with cluster = min core-point id of the
    component, or -1 for noise.

    Hybrid component solve: the ε-pair generation (the O(N²) risk)
    is always distributed; the CORE-GRAPH connected components run
    driver-side union-find when the core graph has ≤
    ``driver_cc_max_edges`` edges (the contracted graph is tiny
    relative to the corpus — a ~10-shuffle iterative solve costs
    orders of magnitude more wall-clock than union-find on 500k
    edges), and fall back to the distributed min-label loop above
    that threshold."""
    pts = df.select(F.col(key_col).alias("id"), to_double(vec_col).alias("vec"))
    pairs = candidate_pairs(
        pts, eps, exact=exact, grid_dims=grid_dims, portable=portable
    )
    # Symmetrize in ONE pass over the pair kernel's output (explode of
    # both orientations; array_distinct collapses self-pairs) — a
    # union of pairs with swapped(pairs) would evaluate the ε-join
    # twice inside the job that materializes sym.
    sym = (
        pairs.select(
            F.explode(
                F.array_distinct(
                    F.array(
                        F.struct(F.col("ia"), F.col("ib")),
                        F.struct(
                            F.col("ib").alias("ia"), F.col("ia").alias("ib")
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.ia", "p.ib")
        .transform(persist_tracked)
    )

    deg = sym.groupBy("ia").agg(F.count(F.lit(1)).alias("n_nb"))
    core = deg.filter(F.col("n_nb") >= min_pts).select(F.col("ia").alias("id"))

    core_edges = (
        sym.join(core.select(F.col("id").alias("ia")), "ia")
        .join(core.select(F.col("id").alias("ib")), "ib")
        .transform(persist_tracked)
    )

    n_core_edges = core_edges.count()
    if n_core_edges <= driver_cc_max_edges:
        labels = _driver_union_find(core, core_edges)
        return _attach_borders(pts, sym, core, labels)

    # Min-label propagation over core-core edges, accelerated with a
    # label JUMP: each pass takes (a) the min label among neighbors'
    # labels (one hop) and (b) the label OF the node named by the
    # current label (lbl ← labels[lbl]). The jump often shortcuts
    # long chains but guarantees nothing beyond the +1 hop on
    # adversarial id layouts (a chain whose min id sits mid-path gets
    # no doubling), so convergence is bounded by the max
    # distance-to-component-min — the loop runs to a fixpoint
    # (changed == 0), which is what makes it exact regardless. Each
    # pass persists its result and unpersists the previous one, so
    # O(1) generations stay cached.
    labels = core.select("id", F.col("id").alias("lbl")).transform(persist_tracked)
    changed = 0
    for it in range(max_iter):
        nb_min = (
            core_edges.join(labels, core_edges.ib == labels.id)
            .groupBy("ia")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        hop = (
            labels.join(nb_min, labels.id == nb_min.ia, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))).alias("lbl"),
            )
        )
        # lbl ← labels[lbl]: labels are min-ids, so labels[lbl] ≤ lbl
        # always holds and the jump only ever tightens.
        jump_src = labels.select(F.col("id").alias("lbl"), F.col("lbl").alias("_l2"))
        new_labels = (
            hop.join(jump_src, "lbl", "left")
            .select("id", F.least(F.col("lbl"), F.coalesce(F.col("_l2"), F.col("lbl"))).alias("lbl"))
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
        if (it + 1) % 4 == 0:
            # Truncate the SQL lineage: each pass references the
            # previous generation THREE times (neighbor-min, identity,
            # jump), so the analyzed plan grows ~3^iter and OOMs the
            # driver around pass 15 — persist caches data but not the
            # plan. localCheckpoint rebases the plan on the cached
            # blocks (pure JVM, no Python roundtrip).
            labels = labels.localCheckpoint()
    if changed:
        warnings.warn(
            f"dbscan: min-label propagation hit max_iter={max_iter} without "
            "converging; components with diameter > max_iter are split. "
            "Raise max_iter.",
            stacklevel=2,
        )
    return _attach_borders(pts, sym, core, track(labels))


def _driver_union_find(core: DataFrame, core_edges: DataFrame) -> DataFrame:
    """Exact min-label components via union-find on the driver — for
    core graphs under the caller's edge threshold. Same label
    convention as the distributed loop (min core id per component)."""
    ids = [r["id"] for r in core.collect()]
    parent = {i: i for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for r in core_edges.select("ia", "ib").collect():
        ra, rb = find(r["ia"]), find(r["ib"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    spark = core.sparkSession
    return spark.createDataFrame(
        [(i, find(i)) for i in ids], "id long, lbl long"
    )


def _attach_borders(
    pts: DataFrame, sym: DataFrame, core: DataFrame, labels: DataFrame
) -> DataFrame:
    """Border points (non-core with a core neighbor) take the min core
    label among neighbors; everything else is noise (-1)."""
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
