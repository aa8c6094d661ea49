"""Graph analytics over pair relations (beyond the connected-
components solver in operators/dedup.py).

`pagerank_fixed`: PageRank with a FIXED iteration count over an
undirected pair graph — every step is a key-shuffled join + a
fixed-point contribution sum, so the whole run is one static plan
per generation and the DuckDB oracle replays it CTE-for-CTE
bit-exactly (catalog g3). Fixed iterations instead of a convergence
loop for the same reason as dup_clusters: determinism and
SQL-replayability; rank ordering stabilizes in a few passes on the
small-diameter graphs dedup produces.

Scale shape: per iteration, one join of edges against the rank
vector (both partitioned by node key) and one groupBy — O(E) shuffle
rows, the standard distributed PageRank layout. Generations are
localCheckpointed: each is referenced by the next join AND the final
select, and an unbounded lineage would re-run the upstream candidate
pipeline per generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q40 = 1 << 40


def pagerank_fixed(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(id, pr) after ``n_iters`` synchronous PageRank updates on the
    symmetrized pair graph (nodes = pair members). Contributions are
    quantized to 2^-40 before summation, so the sum is order- and
    partition-independent and any engine reproduces it."""
    # checkpoint BEFORE symmetrizing (the label_propagation_fixed
    # lesson: the union reads `e` twice and would run the upstream
    # pair pipeline twice)
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint()
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    n = deg.count()
    if n == 0:
        return deg.select(F.col("a").alias("id"), F.lit(0.0).alias("pr"))
    init = 1.0 / n
    base = (1.0 - damping) / n
    r = deg.select(F.col("a").alias("id"), F.lit(init).alias("pr")).localCheckpoint()
    for _ in range(n_iters):
        share = (
            edges.join(r.withColumnRenamed("id", "a"), "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("id"),
                F.round((F.col("pr") / F.col("deg").cast("double")) * F.lit(Q40))
                .cast("long")
                .alias("c"),
            )
        )
        r = (
            share.groupBy("id")
            .agg(
                (
                    F.lit(base)
                    + F.lit(damping) * (F.sum("c") / F.lit(float(Q40)))
                ).alias("pr")
            )
            .localCheckpoint()
        )
    return r


def label_propagation_fixed(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_iters: int = 3,
) -> DataFrame:
    """(id, label, community_size) after ``n_iters`` SYNCHRONOUS label
    propagation updates on the symmetrized pair graph — community
    detection (denser-than-component groupings) where dup_clusters
    gives connectivity.

    Update rule: label_{t+1}(v) = the most frequent label among v's
    neighbors at t, ties broken by smallest label — fully
    deterministic, so the DuckDB oracle replays the unrolled
    iterations CTE-for-CTE (catalog g6). Fixed iteration count for
    the same reason as pagerank_fixed: determinism + replayability.

    Scale shape per iteration: one join of edges against the label
    vector (both keyed by node), one (node, label) count aggregate
    and one per-node top-1 window — O(E) shuffle rows, the standard
    distributed LPA layout. Generations are localCheckpointed:
    each is read by the next join, and unbounded lineage would re-run
    the upstream candidate pipeline per generation.
    """
    # checkpoint BEFORE symmetrizing: the union reads `e` twice, and an
    # unmaterialized e would evaluate the whole upstream candidate+verify
    # pipeline twice (measured: ~85 s of g6b's 1000x wall — the r11
    # "LPA tail" residual was actually this double evaluation; the real
    # LPA tail is ~7 s/flat, SCALE_SPOT_r12 g6b_phase_isolation)
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint()
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    lab = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint()
    )
    from pyspark.sql import Window

    for _ in range(n_iters):
        votes = (
            edges.join(lab.withColumnRenamed("id", "b"), "b")
            .groupBy("a", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("c"), "lbl")
        lab = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("a").alias("id"), "lbl")
            .localCheckpoint()
        )
    sizes = lab.groupBy("lbl").agg(F.count(F.lit(1)).alias("community_size"))
    return (
        lab.join(sizes, "lbl")
        .select(
            F.col("id").alias("doc_id"),
            F.col("lbl").alias("label"),
            "community_size",
        )
    )
