"""Clustering/classification metric queries (SURVEY §2.8 C3/C4).

A deterministic noisy pseudo-clustering over the embeddings table
(30% of rows re-bucketed by md5) feeds NMI/ARI/FMI/accuracy — the
metric math is what's under test, and the oracle reproduces both the
noise and the closed forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.hashing import md5_bucket, md5_unit
from ae_data_integration_spark.operators.metrics import (
    accuracy,
    cluster_metrics,
    munkres_accuracy,
)
from ae_data_integration_spark.tables import table

# Deterministic noisy prediction: 30% of rows get an md5 bucket,
# the rest keep their label.
_PRED_SQL = """
  SELECT label,
         CASE WHEN CAST(('0x' || substr(md5('noise' || CAST(vec_id AS VARCHAR)), 1, 12)) AS BIGINT)
                   / 281474976710656.0 < 0.3
              THEN CAST(CAST(('0x' || substr(md5('alt' || CAST(vec_id AS VARCHAR)), 1, 12)) AS BIGINT) % 10 AS INT)
              ELSE label END AS pred
  FROM embeddings
"""


def _pred_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "label",
        F.when(
            md5_unit("vec_id", salt="noise") < 0.3,
            md5_bucket("vec_id", 10, salt="alt").cast("int"),
        )
        .otherwise(F.col("label"))
        .alias("pred"),
    )


# --- C3: NMI / ARI / FMI ----------------------------------------------------

_C3_SQL = f"""
WITH p AS ({_PRED_SQL}),
ct AS (SELECT label, pred, COUNT(*) AS n_ij FROM p GROUP BY label, pred),
tot AS (SELECT CAST(SUM(n_ij) AS DOUBLE) AS N FROM ct),
a AS (SELECT label, SUM(n_ij) AS a_i FROM ct GROUP BY label),
b AS (SELECT pred, SUM(n_ij) AS b_j FROM ct GROUP BY pred),
stats AS (
  SELECT (SUM(CAST(round(((n_ij / N) * ln(N * n_ij / (a_i * b_j))) * 1099511627776) AS BIGINT)) / 1099511627776.0) AS mi,
         CAST(SUM(CAST(n_ij * (n_ij - 1) / 2 AS DECIMAL(38,6))) AS DOUBLE) AS sum_nij_pairs
  FROM ct JOIN a USING (label) JOIN b USING (pred) CROSS JOIN tot
  GROUP BY N
),
hu AS (
  SELECT (SUM(CAST(round((-(a_i / N) * ln(a_i / N)) * 1099511627776) AS BIGINT)) / 1099511627776.0) AS h_u,
         CAST(SUM(CAST(a_i * (a_i - 1) / 2 AS DECIMAL(38,6))) AS DOUBLE) AS sum_ai_pairs,
         any_value(N) AS N
  FROM a CROSS JOIN tot
),
hv AS (
  SELECT (SUM(CAST(round((-(b_j / N) * ln(b_j / N)) * 1099511627776) AS BIGINT)) / 1099511627776.0) AS h_v,
         CAST(SUM(CAST(b_j * (b_j - 1) / 2 AS DECIMAL(38,6))) AS DOUBLE) AS sum_bj_pairs
  FROM b CROSS JOIN tot
)
SELECT round(mi / ((h_u + h_v) / 2.0), 6) AS nmi,
       round((sum_nij_pairs - sum_ai_pairs * sum_bj_pairs / (N * (N - 1.0) / 2.0))
             / ((sum_ai_pairs + sum_bj_pairs) / 2.0
                - sum_ai_pairs * sum_bj_pairs / (N * (N - 1.0) / 2.0)), 6) AS ari,
       round(sum_nij_pairs / sqrt(sum_ai_pairs * sum_bj_pairs), 6) AS fmi
FROM stats CROSS JOIN hu CROSS JOIN hv
"""


@register("y_c3_cluster_metrics", oracle=_C3_SQL,
          doc="NMI/ARI/FMI from the contingency table, closed forms "
              "(ref evaluation.py:6-12; sklearn-equivalent).",
          tags=("metrics",))
def c3_cluster_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_metrics(_pred_df(spark, sf_dir), "label", "pred")


# --- C4: plain accuracy ------------------------------------------------------

_C4_SQL = f"""
WITH p AS ({_PRED_SQL})
SELECT CAST(SUM(CASE WHEN label = pred THEN 1 ELSE 0 END) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM p
"""


@register("y_c4_accuracy", oracle=_C4_SQL,
          doc="accuracy_score as exact count ratio (ref evaluation.py:53).",
          tags=("metrics",))
def c4_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return accuracy(_pred_df(spark, sf_dir), "label", "pred")


# --- C4b: Munkres-matched accuracy (driver-side Hungarian; no SQL oracle) ---


@register("z_c4_munkres_accuracy", oracle=None,
          doc="Hungarian-matched clustering accuracy (ref evaluation.py:34-53); "
              "k×k assignment on the driver → rows-only check.",
          tags=("metrics",),
          min_rows=1, columns=("munkres_accuracy",))
def c4_munkres_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return munkres_accuracy(_pred_df(spark, sf_dir), "label", "pred")
