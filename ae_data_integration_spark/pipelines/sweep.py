"""O7: the reference's 20-dataset sweep as a thin orchestrator.

The reference loops groups×{2..5} × prop_diff×{0.2..1} and runs the
whole model-selection workflow per simulated dataset pair
(CNC_AE_model_selection.py:557-582), then collates per-dataset
results into the summary tables of AE_results.ipynb (cells 6-20).

Spark-first shape: the per-dataset pipeline is already a DAG of
distributed jobs (pipelines/omics.py), so the sweep is a DRIVER-SIDE
loop submitting one pipeline per dataset against a shared
SparkSession — datasets run back-to-back reusing executors, and the
collated results land in one small DataFrame (rows = datasets, the
AE_results summary shape). On a multi-tenant cluster the same loop
runs with `spark.scheduler.mode=FAIR` + one thread per dataset for
concurrent submission; the per-dataset work itself is already
parallel, which is where the 100-TB scale lives.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ae_data_integration_spark.pipelines.omics import run_reference_pipeline

RESULT_SCHEMA = (
    "dataset string, n_train long, n_test long, best_trial long, "
    "cv_loss double, recon_mean double, recon_std double, "
    "nb_mean_accuracy double, nmi double, ari double, fmi double, "
    "munkres_accuracy double"
)


def sweep_datasets(
    spark: SparkSession,
    datasets: Iterable[tuple[str, str, str]],
    n_trials: int = 2,
    n_folds: int = 3,
    artifacts_root: str | None = None,
    fixture_scale: bool = False,
    max_concurrency: int = 1,
) -> DataFrame:
    """Run the reference workflow for every (name, view1_path,
    view2_path) dataset and return the collated per-dataset results
    table (one row per dataset — the AE_results.ipynb summary).

    ``max_concurrency > 1`` submits that many datasets' job DAGs
    concurrently from driver threads against the shared session (the
    FAIR-scheduler pattern from the module docstring) — results are
    deterministic and ordered regardless, since every pipeline seed is
    md5-derived from names/keys, never from thread timing.
    """
    datasets = list(datasets)

    def one(ds: tuple[str, str, str]):
        name, p1, p2 = ds
        res = run_reference_pipeline(
            spark, p1, p2,
            n_trials=n_trials, n_folds=n_folds,
            artifacts_dir=f"{artifacts_root}/{name}" if artifacts_root else None,
            fixture_scale=fixture_scale,
        )
        accs = [a for _, a in res.nb_accuracy]
        return (
            name,
            int(res.split_counts["n_train"]),
            int(res.split_counts["n_test"]),
            int(res.best_trial["trial"]),
            float(res.best_trial["cv_loss"]),
            float(res.recon_stats["mean"]),
            float(res.recon_stats["std"]),
            float(sum(accs) / len(accs)) if accs else float("nan"),
            float(res.metrics["nmi"]),
            float(res.metrics["ari"]),
            float(res.metrics["fmi"]),
            float(res.metrics["munkres_accuracy"]),
        )

    if max_concurrency > 1 and len(datasets) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            rows = list(pool.map(one, datasets))
    else:
        rows = [one(ds) for ds in datasets]
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def simulation_grid(
    data_root: str,
    groups: Sequence[int] = (2, 3, 4, 5),
    prop_diffs: Sequence[float] = (0.2, 0.4, 0.6, 0.8, 1),
) -> list[tuple[str, str, str]]:
    """The reference's 4×5 dataset grid as (name, rna_path, mirna_path)
    triples (CNC_AE_model_selection.py:560-564 path scheme)."""
    return [
        (
            f"{g}_groups_{p}_diff",
            f"{data_root}/RNA_seq_{g}_groups_{p}_diff.csv",
            f"{data_root}/miRNA_seq_{g}_groups_{p}_diff.csv",
        )
        for g in groups
        for p in prop_diffs
    ]
