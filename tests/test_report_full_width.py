"""§3.3 evaluation chain at the REFERENCE'S TRUE WIDTH (VERDICT r6 #1).

Round 6 proved S1 ingestion at 20,531×1,866 (tests/test_wide_matrix);
this module runs the rest of the report the reference actually
produces at that width — the full AE_results.ipynb flow:

    two views (20,531 + 1,046 features × 1,866 samples, the class
    mix of TCGA_Data/labels.csv) → align → seed-42 stratified split
    (cells 67-68: the 1494/372 golden) → per-split min-max scale →
    model selection (2-trial CV) → retrain → embedding extraction
    (cells 88-106) → GaussianNB CV comparison over the 12 feature
    sets + the retrained model (cells 119-124,
    nb_classification.py:27-29) → tidy summary table

Budget: single slow-marked test, ~4 min wall at local[32] (fixture
generation ~25 s, prepare ~50 s, select+retrain ~40 s, 13 NB feature
sets ~130 s — measured; the wide-NB scorer and the text-split melt
exist because the naive forms blew this budget 3× over).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

# The reference's exact class mix (TCGA_Data/labels.csv: 1,866 rows;
# round(n_c * 0.8) per class sums to 1494 — AE_results.ipynb cell 68).
MIX = (
    ("breast", 621), ("liver", 367), ("lung", 341),
    ("sarcoma", 257), ("kidney", 183), ("melanoma", 97),
)
N_SAMPLES = sum(n for _, n in MIX)
D_GENE, D_MIRNA = 20_531, 1_046


def _cell(f: np.ndarray, s: np.ndarray, off: int):
    """Deterministic 2-decimal matrix values (parse to identical
    doubles in every reader)."""
    return ((f * 131 + s * 17 + off) % 1000) / 100.0


@pytest.fixture(scope="module")
def wide_views(tmp_path_factory):
    assert N_SAMPLES == 1_866
    tmp = tmp_path_factory.mktemp("report_width")
    labels = [lab for lab, n in MIX for _ in range(n)]
    # deterministic interleave so classes are not contiguous blocks
    order = sorted(range(N_SAMPLES), key=lambda j: (j * 2654435761) % N_SAMPLES)
    sample_ids = [f"{labels[order[j]]}.S{j:04d}" for j in range(N_SAMPLES)]
    s_idx = np.arange(N_SAMPLES)

    def write(path, n_feat, off):
        with open(path, "w") as fh:
            fh.write("feature\t" + "\t".join(sample_ids) + "\n")
            block = 512  # stream blocks: never hold all 40M cells
            for f0 in range(0, n_feat, block):
                f_idx = np.arange(f0, min(f0 + block, n_feat))
                vals = _cell(f_idx[:, None], s_idx[None, :], off)
                lines = [
                    f"g{f}\t" + "\t".join(f"{v:.2f}" for v in vals[i])
                    for i, f in enumerate(f_idx)
                ]
                fh.write("\n".join(lines) + "\n")

    p1 = str(tmp / "gene.tsv")
    p2 = str(tmp / "mirna.tsv")
    write(p1, D_GENE, 0)
    write(p2, D_MIRNA, 7)
    assert os.path.getsize(p1) > 150 * 1024 * 1024
    return p1, p2


@pytest.mark.slow
def test_report_chain_at_reference_width(spark, wide_views):
    from ae_data_integration_spark.operators.inference import embed_with_params
    from ae_data_integration_spark.operators.nb import gaussian_nb_cv_accuracy
    from ae_data_integration_spark.operators.train import (
        _seed_from,
        objective_cv,
        sample_params,
        train_full_on_executor,
    )
    from ae_data_integration_spark.pipelines.report_full import (
        nb_feature_set_report,
        prepare_scaled_views,
    )

    p1, p2 = wide_views

    # --- ingest → align → split → scale (cells 67-68) ---
    prepared = prepare_scaled_views(spark, p1, p2)
    all_scaled, counts, (d1, d2) = prepared
    assert counts == {"n_train": 1494, "n_test": 372}  # cell-68 golden
    assert (d1, d2) == (D_GENE, D_MIRNA)

    # --- selection (tiny 2-trial budget) + retrain + extraction ---
    with_vec = all_scaled.select(
        "sample_id", F.concat("features_v1", "features_v2").alias("vec")
    ).persist()
    trials = []
    for t in range(2):
        hyper = sample_params(t)
        hyper["epochs"] = 2
        rows = objective_cv(
            with_vec, "sample_id", "vec", hyper=hyper, n_folds=2,
            fold_salt="cv:", seed_salt=f"trial{t}",
        ).collect()
        assert all(np.isfinite(r["val_loss"]) for r in rows)
        trials.append(
            {"trial": t, "hyper": hyper,
             "cv_loss": float(np.mean([r["val_loss"] for r in rows]))}
        )
    best = min(trials, key=lambda r: r["cv_loss"])
    params = train_full_on_executor(
        with_vec, "sample_id", "vec", hyper=best["hyper"],
        seed=_seed_from("retrain"),
    )
    assert params["W1"].shape == (D_GENE + D_MIRNA, best["hyper"]["hidden"])
    with_vec.unpersist()

    labels = all_scaled.select("sample_id", "label")
    trained_set = (
        embed_with_params(all_scaled, params, "sample_id")
        .join(F.broadcast(labels), "sample_id")
        .select("sample_id", "label", F.col("embedding").alias("vec"))
    )

    # --- the cells-121/124 comparison table (12 sets + retrained) ---
    summary, _ = nb_feature_set_report(
        spark, "", "", n_folds=5, prepared=prepared,
        extra_sets={"ae_trained": trained_set},
    )
    rows = {r["feature_set"]: r for r in summary.collect()}

    expect_dims = {
        "raw_gene": D_GENE, "raw_mirna": D_MIRNA,
        "raw_concat": D_GENE + D_MIRNA,
        "ae_CNC": 8, "ae_X": 16, "ae_MM": 16,
        "ae_JISAE": 24, "ae_JISAE-O1": 24, "ae_JISAE-O2": 24,
        "ae_JISAE-O3": 24, "ae_MOCSS": 24, "jive_concat": 24,
        "ae_trained": best["hyper"]["hidden"],
    }
    assert set(rows) == set(expect_dims)
    for name, r in rows.items():
        assert r["dim"] == expect_dims[name], name
        assert r["folds"] == 5
        # sane accuracy: above degenerate, below perfect on this
        # 6-class synthetic (majority class = 621/1866 = 0.333)
        assert 0.10 <= r["acc_mean"] <= 0.95, (name, r["acc_mean"])
        assert 0.0 <= r["acc_std"] <= 0.2, (name, r["acc_std"])

    # the trained embedding must beat every raw input set — the
    # reference's core claim (AE embeddings vs raw, cells 120-124)
    raw_best = max(rows[n]["acc_mean"] for n in ("raw_gene", "raw_mirna", "raw_concat"))
    assert rows["ae_trained"]["acc_mean"] > raw_best

    # determinism of the NB evaluation at width: the wide-path scorer
    # must be partition-independent (int64-quantized per-dim sums)
    check = gaussian_nb_cv_accuracy(
        trained_set.repartition(17), "sample_id", "label", "vec",
        n_folds=5, salt="nb",
    ).collect()
    accs = [r["accuracy"] for r in sorted(check, key=lambda r: r["fold"])]
    mean = sum(accs) / len(accs)
    assert mean == rows["ae_trained"]["acc_mean"]

    all_scaled.unpersist()
