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


@register("z_o3_objective_cv", oracle=None,
          doc="One model-selection trial: 5-fold CV AE training, all folds "
              "in parallel via applyInPandas (ref CNC_AE_model_selection.py:319-381); "
              "rows-only (gradient descent is not SQL).",
          tags=("train",),
          min_rows=5,
          columns=("fold", "n_train", "n_val", "val_loss", "last_train_loss"))
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
