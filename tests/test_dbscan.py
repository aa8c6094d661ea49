"""DBSCAN vs a brute-force numpy golden (sklearn-convention core/border/noise)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ae_data_integration_spark.operators.dbscan import candidate_pairs, dbscan


def _numpy_dbscan(x: np.ndarray, eps: float, min_pts: int) -> np.ndarray:
    """Reference implementation with the same labeling convention:
    cluster id = min core-point index of the component; border points
    take the min core label among neighbors; noise = -1."""
    n = len(x)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    nb = d2 <= eps * eps
    core = nb.sum(1) >= min_pts
    # components over core-core edges
    lbl = {i: i for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in lbl:
            nbl = [lbl[j] for j in np.where(nb[i])[0] if core[j]]
            m = min([lbl[i]] + nbl)
            if m < lbl[i]:
                lbl[i] = m
                changed = True
    out = np.full(n, -1)
    for i, v in lbl.items():
        out[i] = v
    for i in range(n):
        if not core[i]:
            cores = [lbl[j] for j in np.where(nb[i])[0] if core[j]]
            if cores:
                out[i] = min(cores)
    return out


@pytest.fixture(scope="module")
def blob_df(spark):
    rng = np.random.default_rng(11)
    blobs = [
        rng.normal(loc=c, scale=0.3, size=(25, 4))
        for c in ([0, 0, 0, 0], [5, 5, 5, 5], [-5, 5, -5, 5])
    ]
    noise = rng.uniform(-10, 10, size=(6, 4))
    x = np.concatenate(blobs + [noise])
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), x


def test_dbscan_matches_numpy(spark, blob_df):
    df, x = blob_df
    got = {
        r["id"]: r["cluster"]
        for r in dbscan(df, eps=1.5, min_pts=4).collect()
    }
    want = _numpy_dbscan(x, eps=1.5, min_pts=4)
    assert got == {i: int(want[i]) for i in range(len(x))}
    # sanity: found exactly the 3 blobs + some noise
    clusters = {v for v in got.values() if v != -1}
    assert len(clusters) == 3
    assert sum(1 for v in got.values() if v == -1) >= 1


def test_dbscan_exact_variant_agrees(spark, blob_df):
    df, x = blob_df
    got = {r["id"]: r["cluster"] for r in dbscan(df, eps=1.5, min_pts=4, exact=True).collect()}
    want = _numpy_dbscan(x, eps=1.5, min_pts=4)
    assert got == {i: int(want[i]) for i in range(len(x))}


def test_dbscan_empty_input(spark):
    """Regression: the grid path used to probe first()[0] for
    dimensionality and raise TypeError on zero rows."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dbscan(empty, eps=1.5, min_pts=4).collect() == []
    assert candidate_pairs(
        empty.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        eps=1.5,
    ).collect() == []


def test_dbscan_iteration_cache_bounded(spark, blob_df):
    """Regression: the DISTRIBUTED label propagation (forced via
    driver_cc_max_edges=0) must not leave one persisted DataFrame per
    iteration behind (only O(1) generations cached)."""
    df, _ = blob_df
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    dbscan(df, eps=1.5, min_pts=4, driver_cc_max_edges=0).collect()
    after = jsc.getPersistentRDDs().size()
    # sym + core_edges + the final labels generation stay cached (plus
    # at most a couple of lineage-truncation checkpoints); the
    # per-iteration generations must have been unpersisted.
    assert after - before <= 6


def test_dbscan_driver_and_distributed_cc_agree(spark, blob_df):
    """The hybrid's two component solvers produce identical labels."""
    df, _ = blob_df
    drv = {r["id"]: r["cluster"] for r in dbscan(df, eps=1.5, min_pts=4).collect()}
    dst = {
        r["id"]: r["cluster"]
        for r in dbscan(df, eps=1.5, min_pts=4, driver_cc_max_edges=0).collect()
    }
    assert drv == dst


def test_grid_candidates_prune_far_pairs(spark, blob_df):
    """The grid-bucket join must (a) keep every true ε-pair and
    (b) examine far fewer candidates than the N² all-pairs join."""
    df, x = blob_df
    n = len(x)
    pts = df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    grid = candidate_pairs(pts, eps=1.5, exact=False)
    exact = candidate_pairs(pts, eps=1.5, exact=True)
    grid_pairs = {(r["ia"], r["ib"]) for r in grid.collect()}
    exact_pairs = {(r["ia"], r["ib"]) for r in exact.collect()}
    assert grid_pairs == exact_pairs  # no true neighbor pair missed
    # candidate volume: count pre-distance-filter candidates by
    # re-running the bucket join without the ε filter.
    d = 4
    cells = pts.select(
        "id",
        *[(F.floor(F.element_at("vec", i + 1) / 1.5)).alias(f"g{i}") for i in range(2)],
    )
    # pairs sharing an identical 2-d cell proxy the bucket-join
    # volume (Σ|cell|², the grid join's actual cost driver); assert
    # it ≪ N² — i.e. candidates scale with cluster density, not with
    # the full cross product.
    same_cell = cells.alias("a").join(
        cells.alias("b"), [f"g{i}" for i in range(2)]
    ).count()
    assert same_cell < n * n / 4


@pytest.mark.parametrize("sf_name", ["SF_SMOKE", "SF_CORRECT"])
def test_c2_catalog_query_is_true_dbscan(spark, sf_name):
    """c2_dbscan_fixpoint (the oracled twin, converged solver over
    portable fold-exact ε-pairs) must produce the same cluster-size
    histogram as the exact=True theta-join dbscan() at the same
    (eps, min_pts) — i.e. the catalog query's routing and solver
    really compute DBSCAN, at the driver's correctness SF and not
    just the smoke fixture. Regression guard: in round 5 a fixed
    4-pass component unroll silently split chain-like sf0.01 core
    components and reported 26 'DBSCAN' clusters instead of the true
    21 (self-consistently on both engines)."""
    import tests.conftest as cf
    from ae_data_integration_spark.catalog import load_all
    from ae_data_integration_spark.tables import table

    sf = getattr(cf, sf_name)
    reg = load_all()
    fixp = {
        (r["cluster"], r["n"])
        for r in reg["c2_dbscan_fixpoint"].fn(spark, sf).collect()
    }
    e = table(spark, sf, "embeddings")
    conv = {
        (r["cluster"], r["n"])
        for r in dbscan(e, "vec_id", "embedding", eps=1.15, min_pts=4, exact=True)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert fixp == conv


def test_fixed_unroll_truncates_on_long_chain(spark):
    """Documents the failure mode behind the round-5 truncation bug:
    a fixed-pass min-label unroll splits long-chain components when
    the pass count is too small for the distance-to-component-min
    (reach is at best 2^n even with the label jump, and only ~n on
    adversarial id layouts). A 31-edge chain provably splits at 4
    passes and must converge at the catalog's 16."""
    from ae_data_integration_spark.operators.dedup import dup_labels

    # path ordered 31-30-...-1-0 by construction: distance-to-min up
    # to 31 from the far end
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "doc_a long, doc_b long"
    )
    assert dup_labels(chain, n_iters=4).select("lbl").distinct().count() > 1
    assert dup_labels(chain, n_iters=16).select("lbl").distinct().count() == 1
