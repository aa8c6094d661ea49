"""Training control-plane queries (SURVEY §2.9).

o3_objective_cv runs a real parallel 5-fold CV training trial (one
numpy-Adam AE per fold, one Spark task per fold via applyInPandas).
Gradient descent is not SQL-expressible → rows-only; determinism and
loss-decrease are asserted in tests/test_train.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.operators.train import objective_cv, sample_params
from ae_data_integration_spark.tables import table


def _check_cv_contract(sdf, spark, sf_dir: str) -> str:
    """Semantic contract for the no-oracle CV trial: the per-fold
    train/val sizes must match an INDEPENDENT DuckDB replay of the
    md5 fold assignment exactly (the data-plumbing half of the trial
    is thereby value-checked; only the gradient descent itself stays
    golden-tested), and every loss must be a finite positive float."""
    import math
    import os

    import duckdb

    path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    duck = {
        int(f): int(n)
        for f, n in con.execute(
            "SELECT CAST(('0x' || substr(md5('cv21' || CAST(vec_id AS VARCHAR)), 1, 12))"
            "         AS BIGINT) % 5 AS fold, COUNT(*) AS n "
            f"FROM read_parquet('{path}') GROUP BY 1"
        ).fetchall()
    }
    con.close()
    n_total = sum(duck.values())
    if sorted(sdf["fold"]) != sorted(duck):
        return f"folds {sorted(sdf['fold'])} != md5-replay folds {sorted(duck)}"
    for _, row in sdf.iterrows():
        f = int(row["fold"])
        if int(row["n_val"]) != duck[f]:
            return f"fold {f}: n_val={row['n_val']} != md5-replay {duck[f]}"
        if int(row["n_train"]) != n_total - duck[f]:
            return (
                f"fold {f}: n_train={row['n_train']} != "
                f"{n_total}-{duck[f]}={n_total - duck[f]}"
            )
        for c in ("val_loss", "last_train_loss"):
            v = float(row[c])
            if not (math.isfinite(v) and v > 0):
                return f"fold {f}: {c}={v} not a finite positive loss"
    return ""


@register("z_o3_objective_cv", oracle=None,
          doc="One model-selection trial: 5-fold CV AE training, all folds "
              "in parallel via applyInPandas (ref CNC_AE_model_selection.py:319-381); "
              "no SQL oracle (gradient descent is not SQL) but semantically "
              "contracted: fold sizes must equal a DuckDB md5 replay of the "
              "fold assignment, losses finite and positive.",
          tags=("train",),
          min_rows=5,
          columns=("fold", "n_train", "n_val", "val_loss", "last_train_loss"),
          check=_check_cv_contract)
def o3_objective_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    hyper = sample_params(0)
    hyper["epochs"] = 3  # keep the per-round check fast
    out = objective_cv(e, hyper=hyper, n_folds=5, salt="cv21")
    return out.select(
        "fold", "n_train", "n_val",
        F.round("val_loss", 6).alias("val_loss"),
        F.round("last_train_loss", 6).alias("last_train_loss"),
    )
