"""End-to-end reference-workflow test: two omics TSVs in, embeddings,
NB accuracies, clustering metrics and artifacts out (SURVEY §3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ae_data_integration_spark.pipelines.omics import run_reference_pipeline


@pytest.fixture(scope="module")
def omics_pair(tmp_path_factory):
    """Two aligned features×samples TSVs with group structure
    (mirrors Simulation_Data shape at fixture scale)."""
    tmp = tmp_path_factory.mktemp("omics_e2e")
    rng = np.random.default_rng(42)
    samples = [
        f"Group{g}.Time{t}.Rep{r}" for g in (1, 2, 3) for t in (1, 2, 3, 4) for r in (1, 2, 3)
    ]
    centers = {1: 0.0, 2: 4.0, 3: -4.0}

    def write(path, n_feat):
        data = {
            s: rng.normal(loc=centers[int(s[5])], scale=0.8, size=n_feat)
            for s in samples
        }
        pd.DataFrame(data, index=[f"f{i}" for i in range(n_feat)]).to_csv(
            path, sep="\t", index_label="feature"
        )

    p1, p2 = tmp / "rna.tsv", tmp / "mirna.tsv"
    write(p1, 24)
    write(p2, 8)
    return str(p1), str(p2), len(samples)


def test_full_pipeline(spark, omics_pair, tmp_path):
    p1, p2, n = omics_pair
    res = run_reference_pipeline(
        spark, p1, p2, n_trials=2, n_folds=3, artifacts_dir=str(tmp_path)
    )
    # split: exact stratified counts
    assert res.split_counts["n_train"] + res.split_counts["n_test"] == n
    assert res.split_counts["n_train"] == round(12 * 0.8) * 3  # 3 classes x round(12*.8)
    # selection picked the best of the trials
    assert res.best_trial["cv_loss"] == min(t["cv_loss"] for t in res.trials)
    # embeddings: one per sample, finite recon
    assert res.embeddings.count() == n
    assert np.isfinite(res.recon_stats["mean"]) and res.recon_stats["mean"] > 0
    # NB on well-separated groups beats chance (1/3) comfortably
    accs = [a for _, a in res.nb_accuracy]
    assert np.mean(accs) > 0.6
    # clustering metrics exist and munkres accuracy beats chance
    # (1/3 for 3 groups — the 2-trial, 5-epoch toy AE is a plumbing
    # test, not a quality benchmark)
    assert 0.0 <= res.metrics["nmi"] <= 1.0
    assert res.metrics["munkres_accuracy"] > 0.34
    # artifacts round-trip
    from ae_data_integration_spark.operators.artifacts import load_weights

    w = load_weights(spark, res.artifacts_path)
    assert {"W1", "b1", "W2", "b2"} <= set(w)


def test_distributed_matches_fixture_path(spark, omics_pair):
    """The default (distributed) path and the collect-to-driver twin
    share fold assignment and seeds — cv losses, best trial, and
    embeddings must agree exactly."""
    p1, p2, _ = omics_pair
    rd = run_reference_pipeline(spark, p1, p2, n_trials=2, n_folds=2)
    rf = run_reference_pipeline(spark, p1, p2, n_trials=2, n_folds=2, fixture_scale=True)
    assert [t["cv_loss"] for t in rd.trials] == [t["cv_loss"] for t in rf.trials]
    assert rd.best_trial["trial"] == rf.best_trial["trial"]
    de = {r["sample_id"]: (r["label"], r["embedding"]) for r in rd.embeddings.collect()}
    fe = {r["sample_id"]: (r["label"], r["embedding"]) for r in rf.embeddings.collect()}
    assert de == fe
    assert abs(rd.recon_stats["mean"] - rf.recon_stats["mean"]) < 1e-6


def test_default_path_never_collects_matrix(spark, omics_pair, monkeypatch):
    """Scale guard: the default pipeline must not move row data to the
    driver via toPandas (the r03 verdict's driver-OOM scale-killer)."""
    p1, p2, _ = omics_pair
    df_cls = type(spark.range(1))

    def boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("toPandas called in default pipeline path")

    monkeypatch.setattr(df_cls, "toPandas", boom)
    res = run_reference_pipeline(spark, p1, p2, n_trials=1, n_folds=2)
    assert res.embeddings.count() > 0


def test_sweep_orchestrator(spark, omics_pair, tmp_path):
    """O7: a 2-dataset fixture sweep emits one summary row per dataset
    with the AE_results.ipynb column set."""
    from ae_data_integration_spark.pipelines.sweep import simulation_grid, sweep_datasets

    p1, p2, n = omics_pair
    out = sweep_datasets(
        spark,
        [("ds_a", p1, p2), ("ds_b", p1, p2)],
        n_trials=1,
        n_folds=2,
        artifacts_root=str(tmp_path),
    )
    rows = {r["dataset"]: r for r in out.collect()}
    assert set(rows) == {"ds_a", "ds_b"}
    for r in rows.values():
        assert r["n_train"] + r["n_test"] == n
        assert 0.0 <= r["nmi"] <= 1.0
        assert r["cv_loss"] > 0
    # identical inputs → identical summary rows (determinism)
    assert rows["ds_a"].asDict() == {**rows["ds_b"].asDict(), "dataset": "ds_a"}
    # the reference's 4×5 grid enumerates 20 datasets
    assert len(simulation_grid("/data")) == 20


def test_pipeline_deterministic(spark, omics_pair):
    p1, p2, _ = omics_pair
    r1 = run_reference_pipeline(spark, p1, p2, n_trials=1, n_folds=2)
    r2 = run_reference_pipeline(spark, p1, p2, n_trials=1, n_folds=2)
    assert r1.best_trial["cv_loss"] == r2.best_trial["cv_loss"]
    assert r1.recon_stats == r2.recon_stats
    assert r1.nb_accuracy == r2.nb_accuracy


def _write_simulation_grid(root, groups, prop_diffs):
    """Simulation_Data-shaped fixture files for a (groups x prop_diffs)
    grid on the reference's RNA_seq/miRNA_seq path scheme."""
    rng = np.random.default_rng(7)
    for g in groups:
        for p in prop_diffs:
            samples = [
                f"Group{gi}.Time{t}.Rep{r}"
                for gi in range(1, g + 1)
                for t in (1, 2)
                for r in (1, 2, 3)
            ]
            for prefix, n_feat in (("RNA_seq", 20), ("miRNA_seq", 8)):
                data = {
                    s: rng.normal(
                        loc=(int(s[5]) - 1) * 5.0 * p, scale=0.8, size=n_feat
                    )
                    for s in samples
                }
                pd.DataFrame(
                    data, index=[f"f{i}" for i in range(n_feat)]
                ).to_csv(
                    root / f"{prefix}_{g}_groups_{p}_diff.csv",
                    sep="\t",
                    index_label="feature",
                )


def test_sweep_simulation_grid_slice(spark, tmp_path):
    """O7 at grid shape: a 2x2 simulation_grid slice (4 datasets on the
    reference's RNA_seq/miRNA_seq path scheme) sweeps end-to-end into
    the AE_results.ipynb summary table (cells 6-20): one row per
    dataset, the full RESULT_SCHEMA column set, and bit-identical
    rows across reruns."""
    from ae_data_integration_spark.pipelines.sweep import (
        RESULT_SCHEMA,
        simulation_grid,
        sweep_datasets,
    )

    root = tmp_path / "sim_data"
    root.mkdir()
    groups, prop_diffs = (2, 3), (0.2, 0.4)
    _write_simulation_grid(root, groups, prop_diffs)

    grid = simulation_grid(str(root), groups=groups, prop_diffs=prop_diffs)
    assert len(grid) == 4
    out1 = sweep_datasets(
        spark, grid, n_trials=1, n_folds=2, max_concurrency=4
    ).collect()
    want_cols = [c.split()[0] for c in RESULT_SCHEMA.split(", ")]
    assert [f.name for f in sweep_datasets(spark, [], ).schema] == want_cols

    rows1 = {r["dataset"]: r.asDict() for r in out1}
    assert set(rows1) == {f"{g}_groups_{p}_diff" for g in groups for p in prop_diffs}
    for name, r in rows1.items():
        g = int(name.split("_")[0])
        assert r["n_train"] + r["n_test"] == g * 6
        assert np.isfinite(r["cv_loss"]) and r["cv_loss"] > 0
        assert 0.0 <= r["nmi"] <= 1.0 and 0.0 <= r["munkres_accuracy"] <= 1.0
    # determinism: the whole sweep reruns to bit-identical rows under a
    # different thread interleaving (seeds are md5-derived, never
    # thread-timing-dependent), plus a serial 1-dataset spot-check
    rows2 = {r["dataset"]: r.asDict() for r in
             sweep_datasets(spark, grid, n_trials=1, n_folds=2,
                            max_concurrency=2).collect()}
    assert rows1 == rows2
    serial = sweep_datasets(spark, grid[:1], n_trials=1, n_folds=2).collect()
    assert serial[0].asDict() == rows1[serial[0]["dataset"]]


def test_sweep_full_20_dataset_grid(spark, tmp_path):
    """O7 at the reference's FULL scale: the complete 4x5 simulation
    grid (groups x {2,3,4,5}, prop_diff x {0.2..1} — the reference's
    CNC_AE_model_selection.py:557-582 loop) sweeps end-to-end through
    model selection, retraining, embedding, NB CV, and clustering
    metrics, producing the 20-row AE_results.ipynb summary (cells
    6-20). Rows are deterministic: a concurrent rerun of a grid
    subset reproduces its rows bit-identically (md5-derived seeds,
    never thread timing)."""
    from ae_data_integration_spark.pipelines.sweep import (
        simulation_grid,
        sweep_datasets,
    )

    root = tmp_path / "sim_data_full"
    root.mkdir()
    groups, prop_diffs = (2, 3, 4, 5), (0.2, 0.4, 0.6, 0.8, 1)
    _write_simulation_grid(root, groups, prop_diffs)
    grid = simulation_grid(str(root), groups=groups, prop_diffs=prop_diffs)
    assert len(grid) == 20

    out = sweep_datasets(
        spark, grid, n_trials=1, n_folds=2, max_concurrency=4
    ).collect()
    rows = {r["dataset"]: r.asDict() for r in out}
    assert set(rows) == {
        f"{g}_groups_{p}_diff" for g in groups for p in prop_diffs
    }
    for name, r in rows.items():
        g = int(name.split("_")[0])
        assert r["n_train"] + r["n_test"] == g * 6
        assert np.isfinite(r["cv_loss"]) and r["cv_loss"] > 0
        assert np.isfinite(r["recon_mean"]) and r["recon_mean"] > 0
        assert 0.0 <= r["nmi"] <= 1.0 and 0.0 <= r["munkres_accuracy"] <= 1.0
    # group separation grows with prop_diff: the strongest-separated
    # dataset should cluster at least as well as the weakest
    assert rows["2_groups_1_diff"]["nmi"] >= rows["2_groups_0.2_diff"]["nmi"] - 0.25
    # determinism across reruns + thread interleavings: re-sweep a
    # 3-dataset subset concurrently and require bit-identical rows
    subset = [d for d in grid if d[0] in
              ("2_groups_0.2_diff", "4_groups_0.6_diff", "5_groups_1_diff")]
    rerun = {r["dataset"]: r.asDict() for r in
             sweep_datasets(spark, subset, n_trials=1, n_folds=2,
                            max_concurrency=3).collect()}
    assert rerun == {k: rows[k] for k in rerun}
