"""Gaussian Naive Bayes 5-fold CV — the flagship relational-ML query.

Exercises operators/nb.py (SURVEY §2.8 C6: the reference's
nb_classification.py re-expressed as one-pass DataFrame aggregates).
The DuckDB oracle replicates the entire model: hashed fold
assignment, total-minus-fold train statistics, Gaussian
log-likelihood scoring, argmax, per-fold accuracy.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.operators.nb import gaussian_nb_cv_accuracy
from ae_data_integration_spark.tables import table

_LN_2PI = repr(float(math.log(2 * math.pi)))


def _c6_sql(vec_expr: str = "list_transform(embedding, x -> CAST(x AS DOUBLE))") -> str:
    """The full GaussianNB-CV oracle for an arbitrary vector
    expression over the embeddings table — the c6 text verbatim when
    called with the default (rep3 reuses it per feature set)."""
    return f"""
WITH base AS (
  SELECT vec_id AS id, label AS y,
         CAST(('0x' || substr(md5('nb' || CAST(vec_id AS VARCHAR)), 1, 12)) AS BIGINT) % 5 AS fold,
         {vec_expr} AS vec
  FROM embeddings
),
long AS (
  SELECT id, y, fold, generate_subscripts(vec, 1) - 1 AS dim, unnest(vec) AS x FROM base
),
part AS (
  SELECT fold, y, dim,
         SUM(CAST(round(x * 1099511627776) AS BIGINT)) AS s1,
         SUM(CAST(round(x * x * 1099511627776) AS BIGINT)) AS s2,
         COUNT(*) AS cnt
  FROM long GROUP BY fold, y, dim
),
tot AS (SELECT y, dim, SUM(s1) AS t1, SUM(s2) AS t2, SUM(cnt) AS tc FROM part GROUP BY y, dim),
folds AS (SELECT unnest(range(0, 5)) AS fold),
dim_part AS (SELECT fold, dim, SUM(s1) AS ds1, SUM(s2) AS ds2, SUM(cnt) AS dc FROM part GROUP BY fold, dim),
dim_tot AS (SELECT dim, SUM(ds1) AS dt1, SUM(ds2) AS dt2, SUM(dc) AS dtc FROM dim_part GROUP BY dim),
dvar AS (
  SELECT fold, u2 / n_d - (u1 / n_d) * (u1 / n_d) AS vard FROM (
    SELECT f.fold,
           CAST(dt.dt1 - COALESCE(dp.ds1, 0) AS DOUBLE) / 1099511627776.0 AS u1,
           CAST(dt.dt2 - COALESCE(dp.ds2, 0) AS DOUBLE) / 1099511627776.0 AS u2,
           dt.dtc - COALESCE(dp.dc, 0) AS n_d
    FROM folds f
    CROSS JOIN dim_tot dt
    LEFT JOIN dim_part dp ON dp.fold = f.fold AND dp.dim = dt.dim
  )
),
eps AS (SELECT fold, 1e-9 * MAX(vard) AS eps FROM dvar GROUP BY fold),
stats AS (
  SELECT f.fold, t.y, t.dim,
         CAST(t.t1 - COALESCE(p.s1, 0) AS DOUBLE) / 1099511627776.0 AS sum1,
         CAST(t.t2 - COALESCE(p.s2, 0) AS DOUBLE) / 1099511627776.0 AS sum2,
         t.tc - COALESCE(p.cnt, 0) AS n_tr
  FROM folds f
  CROSS JOIN tot t
  LEFT JOIN part p ON p.fold = f.fold AND p.y = t.y AND p.dim = t.dim
),
model AS (
  SELECT s.fold, s.y, s.dim,
         sum1 / n_tr AS mu,
         sum2 / n_tr - (sum1 / n_tr) * (sum1 / n_tr) + e.eps AS var
  FROM stats s JOIN eps e ON e.fold = s.fold
),
cls_fold AS (SELECT fold, y, COUNT(*) AS cn FROM base GROUP BY fold, y),
cls_tot AS (SELECT y, SUM(cn) AS ct FROM cls_fold GROUP BY y),
n_fold AS (SELECT fold, COUNT(*) AS nf FROM base GROUP BY fold),
n_tot AS (SELECT COUNT(*) AS nt FROM base),
priors AS (
  SELECT f.fold, c.y,
         ln(CAST(c.ct - COALESCE(cf.cn, 0) AS DOUBLE) / CAST(nt - nf AS DOUBLE)) AS log_prior
  FROM folds f
  CROSS JOIN cls_tot c
  LEFT JOIN cls_fold cf ON cf.fold = f.fold AND cf.y = c.y
  JOIN n_fold ON n_fold.fold = f.fold
  CROSS JOIN n_tot
),
scored AS (
  SELECT l.id, l.y, l.fold, m.y AS cls,
         (SUM(CAST(round(greatest(-0.5 * ({_LN_2PI} + ln(m.var))
                       - (l.x - m.mu) * (l.x - m.mu) / (2.0 * m.var), -1e4)
                  * 1073741824) AS BIGINT)) / 1073741824.0) AS ll
  FROM long l
  JOIN model m ON m.fold = l.fold AND m.dim = l.dim
  GROUP BY l.id, l.y, l.fold, m.y
),
with_prior AS (
  SELECT s.id, s.y, s.fold, s.cls, s.ll + p.log_prior AS score
  FROM scored s JOIN priors p ON p.fold = s.fold AND p.y = s.cls
),
pred AS (
  SELECT id, y, fold, cls AS pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY score DESC, cls) AS rk
    FROM with_prior
  ) WHERE rk = 1
)
SELECT fold, COUNT(*) AS n_test,
       CAST(SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM pred
GROUP BY fold
ORDER BY fold
"""


_C6_SQL = _c6_sql()


@register("c6_gaussian_nb_cv", oracle=_C6_SQL,
          doc="GaussianNB 5-fold CV accuracy as one-pass DataFrame aggs "
              "(ref nb_classification.py:1-38); total-minus-fold train stats.",
          tags=("metrics", "ml", "flagship", "bench"))
def c6_gaussian_nb_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    # scorer pinned: the oracled flagship keeps the SQL-replayable
    # relational scoring plan regardless of vector width.
    return gaussian_nb_cv_accuracy(
        e, "vec_id", "label", "embedding", n_folds=5, salt="nb",
        scorer="relational",
    )


@register("c6b_nb_wide_scorer", oracle=_C6_SQL,
          doc="The SAME GaussianNB model through the wide-vector scale "
              "path (operators/nb.gaussian_nb_cv_accuracy_wide: broadcast "
              "model + Arrow-batched numpy scoring, zero scoring shuffle "
              "— the path the 20,531-feature report sets use) against the "
              "IDENTICAL DuckDB oracle as c6 — a value-hash proof the "
              "Python kernel reproduces the relational scorer bit-for-bit "
              "(int64-quantized per-dim log-likelihoods, first-max "
              "tie-break == score DESC, cls ASC).",
          tags=("metrics", "ml"))
def c6b_nb_wide_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.nb import gaussian_nb_cv_accuracy_wide

    e = table(spark, sf_dir, "embeddings")
    return gaussian_nb_cv_accuracy_wide(
        e, "vec_id", "label", "embedding", n_folds=5, salt="nb"
    )


# --- rep3: the §3.3 feature-set comparison table, fully oracled -------------
# Fixture-scale twin of pipelines/report_full.nb_feature_set_report
# (the cells-121/124 "report query"): the 64-d embedding stands in for
# the concatenated views — v1 = dims 1-32, v2 = dims 33-64, concat =
# all 64, fused = J4 mean of the halves — and the ENTIRE per-set
# GaussianNB 5-fold CV (model fit, scoring, argmax, accuracy) is
# replayed by the oracle once per feature set. The reference-width run
# of the real report lives in tests/test_report_full_width.py; this
# query puts the report's table SHAPE under the value-hash gate.

_REP3_SETS = (
    ("v1", "list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))"),
    ("v2", "list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))"),
    ("concat", "list_transform(embedding, x -> CAST(x AS DOUBLE))"),
    ("fused_mean",
     "list_transform(list_zip(embedding[1:32], embedding[33:64]),"
     " p -> (CAST(p[1] AS DOUBLE) + CAST(p[2] AS DOUBLE)) / 2)"),
)

_REP3_SQL = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS feature_set, fold, n_test, accuracy FROM ({_c6_sql(expr)})"
    for name, expr in _REP3_SETS
) + "\nORDER BY feature_set, fold"


@register("rep3_nb_feature_table", oracle=_REP3_SQL,
          doc="The AE_results feature-set comparison table (cells "
              "121/124) as one oracled query: GaussianNB 5-fold CV per "
              "feature set (view slices, concat, J4 mean-fuse of the "
              "embedding halves), every per-fold accuracy value-hashed "
              "— 4 full NB model fits replayed by the oracle.",
          tags=("metrics", "ml", "report"))
def rep3_nb_feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "embeddings")
    half1 = F.slice("embedding", 1, 32)
    half2 = F.slice("embedding", 33, 32)
    sets = {
        "v1": e.select("vec_id", "label", half1.alias("vec")),
        "v2": e.select("vec_id", "label", half2.alias("vec")),
        "concat": e.select("vec_id", "label", F.col("embedding").alias("vec")),
        "fused_mean": e.select(
            "vec_id", "label",
            F.zip_with(
                half1, half2,
                lambda a, b: (a.cast("double") + b.cast("double")) / 2,
            ).alias("vec"),
        ),
    }
    out = None
    for name, df in sets.items():
        acc = gaussian_nb_cv_accuracy(
            df, "vec_id", "label", "vec", n_folds=5, salt="nb",
            scorer="relational",
        ).select(F.lit(name).alias("feature_set"), "fold", "n_test", "accuracy")
        out = acc if out is None else out.unionByName(acc)
    return out.orderBy("feature_set", "fold")
