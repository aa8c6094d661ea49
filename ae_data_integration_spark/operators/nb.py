"""Gaussian Naive Bayes with k-fold CV, purely as DataFrame aggs.

The reference's flagship evaluation classifier
(Evaluation_Auxiliary/nb_classification.py:1-38: sklearn
cross_validate(GaussianNB(), cv=5)). MLlib's NaiveBayes is
multinomial-only, so the engine implements the Gaussian variant
natively (SURVEY §2.8 C6) — it is *trivially relational*: per
(class, dim) mean/variance aggregates + a log-likelihood scoring
projection + an argmax window.

Scale design: the data is exploded to long form ONCE; per-fold
training statistics are derived as (total − fold) on decimal partial
sums, so 5-fold CV costs one pass over the data instead of five.
All sums are decimal (partition-order independent); only log/ln in
the scoring layer is sub-ulp engine-variant, which can flip an
argmax only on near-exact score ties.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double
from ae_data_integration_spark.functions.hashing import md5_bucket
from ae_data_integration_spark.functions.portable import Q30, Q40

_LN_2PI = float(math.log(2 * math.pi))


def gaussian_nb_cv_accuracy(
    df: DataFrame,
    key_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_folds: int = 5,
    salt: str = "nb",
    var_smoothing: float = 1e-9,
) -> DataFrame:
    """Per-fold CV accuracy of Gaussian NB. Returns (fold, n_test, accuracy)."""
    base = df.select(
        F.col(key_col).alias("id"),
        F.col(label_col).alias("y"),
        md5_bucket(key_col, n_folds, salt).alias("fold"),
        to_double(vec_col).alias("vec"),
    )
    # `long` feeds both the training-statistics pass and the scoring
    # join; it is recomputed rather than persisted — at corpus scale a
    # 64x-exploded cache costs more than the second scan-side explode.
    long = base.select(
        "id", "y", "fold", F.posexplode("vec").alias("dim", "x")
    )

    # One-pass partial sums per (fold, class, dim), decimal-exact.
    # part is MODEL-sized (folds × classes × dims rows) and feeds two
    # branches (train stats and the adaptive-eps pass); persist it so
    # the N×d explode+aggregate runs once, not once per branch —
    # exchange reuse does not always cover both consumers under AQE.
    part = long.groupBy("fold", "y", "dim").agg(
        F.sum(F.round(F.col("x") * F.lit(Q40)).cast("long")).alias("s1"),
        F.sum(F.round(F.col("x") * F.col("x") * F.lit(Q40)).cast("long")).alias("s2"),
        F.count(F.lit(1)).alias("cnt"),
    ).persist()
    tot = part.groupBy("y", "dim").agg(
        F.sum("s1").alias("t1"), F.sum("s2").alias("t2"), F.sum("cnt").alias("tc")
    )
    folds = df.sparkSession.range(n_folds).select(F.col("id").alias("fold"))

    # sklearn GaussianNB smoothing is ADAPTIVE: epsilon = var_smoothing
    # * max over dims of Var(x) on the fold's training rows (classes
    # pooled), not an absolute 1e-9 — matching the reference's
    # nb_classification.py classifier exactly.
    dim_part = part.groupBy("fold", "dim").agg(
        F.sum("s1").alias("ds1"), F.sum("s2").alias("ds2"), F.sum("cnt").alias("dc")
    )
    dim_tot = dim_part.groupBy("dim").agg(
        F.sum("ds1").alias("dt1"), F.sum("ds2").alias("dt2"), F.sum("dc").alias("dtc")
    )
    dvar = (
        folds.crossJoin(dim_tot)
        .join(dim_part, ["fold", "dim"], "left")
        .select(
            "fold",
            ((F.col("dt1") - F.coalesce(F.col("ds1"), F.lit(0))) / F.lit(float(Q40))).alias("u1"),
            ((F.col("dt2") - F.coalesce(F.col("ds2"), F.lit(0))) / F.lit(float(Q40))).alias("u2"),
            (F.col("dtc") - F.coalesce(F.col("dc"), F.lit(0))).alias("n_d"),
        )
        .withColumn("mud", F.col("u1") / F.col("n_d"))
        .withColumn("vard", F.col("u2") / F.col("n_d") - F.col("mud") * F.col("mud"))
    )
    eps = dvar.groupBy("fold").agg(
        (F.lit(var_smoothing) * F.max("vard")).alias("eps")
    )

    # Train stats for test-fold f = totals − fold-f partials.
    stats = (
        folds.crossJoin(tot)
        .join(part, ["fold", "y", "dim"], "left")
        .select(
            "fold", "y", "dim",
            ((F.col("t1") - F.coalesce(F.col("s1"), F.lit(0))) / F.lit(float(Q40))).alias("sum1"),
            ((F.col("t2") - F.coalesce(F.col("s2"), F.lit(0))) / F.lit(float(Q40))).alias("sum2"),
            (F.col("tc") - F.coalesce(F.col("cnt"), F.lit(0))).alias("n_tr"),
        )
        .join(F.broadcast(eps), "fold")
        .withColumn("mu", F.col("sum1") / F.col("n_tr"))
        .withColumn(
            "var",
            F.col("sum2") / F.col("n_tr") - F.col("mu") * F.col("mu") + F.col("eps"),
        )
    )

    # Class priors per test fold, same total-minus-fold trick.
    cls_fold = base.groupBy("fold", "y").agg(F.count(F.lit(1)).alias("cn"))
    cls_tot = cls_fold.groupBy("y").agg(F.sum("cn").alias("ct"))
    n_tot = base.agg(F.count(F.lit(1)).alias("nt"))
    n_fold = base.groupBy("fold").agg(F.count(F.lit(1)).alias("nf"))
    priors = (
        folds.crossJoin(cls_tot)
        .join(cls_fold, ["fold", "y"], "left")
        .join(F.broadcast(n_fold), "fold")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "fold", "y",
            F.log(
                (F.col("ct") - F.coalesce(F.col("cn"), F.lit(0))).cast("double")
                / (F.col("nt") - F.col("nf")).cast("double")
            ).alias("log_prior"),
        )
    )

    # Score every test row against every class of its fold's model.
    cand = stats.select("fold", F.col("y").alias("cls"), "dim", "mu", "var")
    # Clamp at -1e4 so a degenerate (class, dim) variance cannot
    # overflow the fixed-point accumulator (argmax is unaffected).
    ll_dim = F.greatest(
        F.lit(-0.5) * (F.lit(_LN_2PI) + F.log(F.col("var")))
        - (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
        / (F.lit(2.0) * F.col("var")),
        F.lit(-1e4),
    )
    scored = (
        long.join(F.broadcast(cand), ["fold", "dim"])
        .groupBy("id", "y", "fold", "cls")
        .agg((F.sum(F.round(ll_dim * F.lit(Q30)).cast("long")) / F.lit(float(Q30))).alias("ll"))
        .join(
            F.broadcast(priors.select("fold", F.col("y").alias("cls"), "log_prior")),
            ["fold", "cls"],
        )
        .withColumn("score", F.col("ll") + F.col("log_prior"))
    )
    # Argmax as a max-of-struct aggregation, not a row_number window:
    # a window would exchange + SORT the whole scored table by id; the
    # hash agg partial-aggregates map-side and never sorts. Tie-break
    # matches ORDER BY score DESC, cls ASC via the -cls struct field.
    pred = (
        scored.groupBy("id", "y", "fold")
        .agg(
            F.max(
                F.struct(F.col("score"), (-F.col("cls")).alias("_nc"), F.col("cls"))
            )["cls"].alias("pred")
        )
    )
    return (
        pred.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            (
                F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("accuracy"),
        )
        .orderBy("fold")
    )
