"""Gaussian Naive Bayes with k-fold CV, purely as DataFrame aggs.

The reference's flagship evaluation classifier
(Evaluation_Auxiliary/nb_classification.py:1-38: sklearn
cross_validate(GaussianNB(), cv=5)). MLlib's NaiveBayes is
multinomial-only, so the engine implements the Gaussian variant
natively (SURVEY §2.8 C6) — it is *trivially relational*: per
(class, dim) mean/variance aggregates + a log-likelihood scoring
projection + an argmax aggregation.

Scale design: TWO distributed passes over the data, total.

1. Sufficient statistics: one explode + groupBy producing fixed-point
   partial sums per (fold, class, dim). The result is MODEL-sized
   (folds × classes × dims cells — independent of row count, like a
   kmeans centroid table), so it is collected and the per-fold
   train statistics (total − fold), the adaptive sklearn smoothing
   epsilon, and the class priors are assembled DRIVER-SIDE with the
   same IEEE double ops the previous all-relational formulation ran
   engine-side. This removes ~8 shuffle/broadcast stages over
   1600-row relations from the critical path — at any SF the model
   never grows, so driver assembly is scale-safe.
2. Scoring: the model re-enters the plan as a broadcast literal
   DataFrame; one explode + broadcast join + two hash aggregations
   produce per-fold accuracy. Partial sums are fixed-point (decimal
   exact, partition-order independent); only log/ln is sub-ulp
   engine-variant, which can flip an argmax only on near-exact
   score ties.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double
from ae_data_integration_spark.functions.hashing import md5_bucket
from ae_data_integration_spark.functions.portable import Q30, Q40, np_round_half_away
from ae_data_integration_spark.functions.routing import route_wide

_LN_2PI = float(math.log(2 * math.pi))


def _suff_stats(base: DataFrame) -> list:
    """PASS 1 — one-shuffle sufficient statistics per (fold, class,
    dim), fixed-point exact. cnt is constant across dims of a
    (fold, class), so class/fold row counts fall out of the same
    aggregate: no separate count pass. The result is MODEL-sized."""
    long = base.select(
        "id", "y", "fold", F.posexplode("vec").alias("dim", "x")
    )
    return (
        long.groupBy("fold", "y", "dim")
        .agg(
            F.sum(F.round(F.col("x") * F.lit(Q40)).cast("long")).alias("s1"),
            F.sum(F.round(F.col("x") * F.col("x") * F.lit(Q40)).cast("long")).alias("s2"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )


def gaussian_nb_cv_accuracy(
    df: DataFrame,
    key_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_folds: int = 5,
    salt: str = "nb",
    var_smoothing: float = 1e-9,
    scorer: str = "auto",
    dim: int | None = None,
) -> DataFrame:
    """Per-fold CV accuracy of Gaussian NB. Returns (fold, n_test, accuracy).

    ``scorer`` picks the scoring pass (the model fit is shared and
    identical): "relational" = per-class row-expansion join + hash
    agg, fully SQL-replayable; "arrow" = broadcast-model numpy kernel
    (gaussian_nb_cv_accuracy_wide), zero scoring shuffle; "auto" =
    arrow when the vector is wide (functions.routing.route_wide,
    width > 256 — measured at 100x data: 66 s relational vs 8.4 s
    arrow on 6.4M x 64-d rows, the x-classes row expansion is the
    relational path's scale term), else relational. Both scorers are
    bit-equal (c6b_nb_wide_scorer passes the identical DuckDB
    oracle); catalog queries pin the scorer so their physical plans
    stay stable under the gate.

    ``dim``: the known vector width; passing it lets "auto" route
    without the one-job width probe (report_full knows its view
    widths and passes them).
    """
    if scorer not in ("auto", "relational", "arrow"):
        raise ValueError(scorer)
    if scorer == "arrow" or (
        scorer == "auto" and route_wide(df, vec_col, dim=dim)
    ):
        return gaussian_nb_cv_accuracy_wide(
            df, key_col, label_col, vec_col, n_folds, salt, var_smoothing
        )
    spark = df.sparkSession
    base = df.select(
        F.col(key_col).alias("id"),
        F.col(label_col).alias("y"),
        md5_bucket(key_col, n_folds, salt).alias("fold"),
        to_double(vec_col).alias("vec"),
    )
    # the statistics pass and the scoring join each re-derive the
    # exploded form — at corpus scale a 64x-exploded cache costs more
    # than the second scan-side explode.
    long = base.select(
        "id", "y", "fold", F.posexplode("vec").alias("dim", "x")
    )
    cells = _suff_stats(base)
    cand_rows, prior_rows = _assemble_model(cells, n_folds, var_smoothing)

    cand = spark.createDataFrame(
        cand_rows, "fold int, cls long, dim int, mu double, var double"
    )
    priors = spark.createDataFrame(
        prior_rows, "fold int, cls long, log_prior double"
    )

    # PASS 2 — score every test row against every class of its fold's
    # model. Clamp at -1e4 so a degenerate (class, dim) variance cannot
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
        .join(F.broadcast(priors), ["fold", "cls"])
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
    return _fold_accuracy(pred)


def _fold_accuracy(pred: DataFrame) -> DataFrame:
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


def _assemble_model(cells: list, n_folds: int, var_smoothing: float):
    """Driver-side model assembly (pure-integer partials → the exact
    double expressions the engine-side plan used to run). Returns
    (cand_rows, prior_rows): per-(test-fold, class) train-split
    means/variances with sklearn's ADAPTIVE smoothing, and log
    priors."""
    s1 = {(c["fold"], c["y"], c["dim"]): c["s1"] for c in cells}
    s2 = {(c["fold"], c["y"], c["dim"]): c["s2"] for c in cells}
    cnt = {(c["fold"], c["y"], c["dim"]): c["cnt"] for c in cells}
    classes = sorted({k[1] for k in s1})
    dims = sorted({k[2] for k in s1})
    folds = range(n_folds)

    # totals per (class, dim) and per dim (classes pooled), exact ints
    t1 = {(y, d): sum(s1.get((f, y, d), 0) for f in folds) for y in classes for d in dims}
    t2 = {(y, d): sum(s2.get((f, y, d), 0) for f in folds) for y in classes for d in dims}
    tc = {(y, d): sum(cnt.get((f, y, d), 0) for f in folds) for y in classes for d in dims}

    # sklearn GaussianNB smoothing is ADAPTIVE: epsilon = var_smoothing
    # * max over dims of Var(x) on the fold's training rows (classes
    # pooled), not an absolute 1e-9 — matching the reference's
    # nb_classification.py classifier exactly.
    eps = {}
    for f in folds:
        vmax = None
        for d in dims:
            u1 = (sum(t1[(y, d)] for y in classes)
                  - sum(s1.get((f, y, d), 0) for y in classes)) / float(Q40)
            u2 = (sum(t2[(y, d)] for y in classes)
                  - sum(s2.get((f, y, d), 0) for y in classes)) / float(Q40)
            n_d = (sum(tc[(y, d)] for y in classes)
                   - sum(cnt.get((f, y, d), 0) for y in classes))
            if n_d <= 0:
                continue
            mud = u1 / n_d
            vard = u2 / n_d - mud * mud
            vmax = vard if vmax is None or vard > vmax else vmax
        eps[f] = var_smoothing * (vmax or 0.0)

    # train stats for test-fold f = totals − fold-f partials
    cand_rows = []
    for f in folds:
        for y in classes:
            n_tr = tc[(y, dims[0])] - cnt.get((f, y, dims[0]), 0)
            if n_tr <= 0:
                continue  # class absent from training split: no candidate
            for d in dims:
                sum1 = (t1[(y, d)] - s1.get((f, y, d), 0)) / float(Q40)
                sum2 = (t2[(y, d)] - s2.get((f, y, d), 0)) / float(Q40)
                mu = sum1 / n_tr
                var = sum2 / n_tr - mu * mu + eps[f]
                cand_rows.append((f, y, d, mu, var))

    # class priors per test fold, same total-minus-fold trick
    n_fold = {f: sum(cnt.get((f, y, dims[0]), 0) for y in classes) for f in folds}
    n_tot = sum(n_fold.values())
    prior_rows = []
    for f in folds:
        for y in classes:
            n_tr_y = tc[(y, dims[0])] - cnt.get((f, y, dims[0]), 0)
            if n_tr_y <= 0:
                continue
            prior_rows.append(
                (f, y, math.log(n_tr_y / float(n_tot - n_fold[f])))
            )

    return cand_rows, prior_rows


def gaussian_nb_cv_accuracy_wide(
    df: DataFrame,
    key_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_folds: int = 5,
    salt: str = "nb",
    var_smoothing: float = 1e-9,
) -> DataFrame:
    """C6 at WIDE vector dimensionality (the reference's raw 20,531-
    feature Gene view, nb_classification.py on the un-embedded
    inputs). Identical model to gaussian_nb_cv_accuracy — same
    fixed-point sufficient statistics (one shuffle), same driver
    assembly, same per-dim Q30-quantized log-likelihood and
    score-then-smallest-class tie-break — but the scoring pass is an
    Arrow-batched numpy kernel with the model BROADCAST instead of a
    per-class row-expansion join: at d=21,577 the relational scorer
    explodes 1,866 rows into 40M (dim, x) rows and re-expands them
    x classes through a hash aggregation, all to compute what is one
    (batch x dim) @ per-class reduction — the classic case where the
    built-in operators genuinely can't express the batch-matrix
    semantics efficiently and a Pandas-batched kernel is the scale
    path. Scoring shuffles NOTHING (one final fold-count agg only).

    int64 per-dim quantization makes the numpy sum order-independent,
    so results are partition-independent and match the relational
    twin exactly up to sub-ulp engine log() differences (verified
    equal on the fixture in tests/test_operators.py).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    spark = df.sparkSession
    base = df.select(
        F.col(key_col).alias("id"),
        F.col(label_col).cast("long").alias("y"),
        md5_bucket(key_col, n_folds, salt).alias("fold"),
        to_double(vec_col).alias("vec"),
    )
    cells = _suff_stats(base)
    cand_rows, prior_rows = _assemble_model(cells, n_folds, var_smoothing)

    dims = sorted({d for _, _, d, _, _ in cand_rows})
    d_all = len(dims)
    model: dict[int, dict] = {}
    for f in range(n_folds):
        classes = sorted({y for ff, y, *_ in cand_rows if ff == f})
        if not classes:
            continue
        c_idx = {y: i for i, y in enumerate(classes)}
        mu = np.zeros((len(classes), d_all))
        var = np.ones((len(classes), d_all))
        for ff, y, d, m, v in cand_rows:
            if ff == f:
                mu[c_idx[y], d] = m
                var[c_idx[y], d] = v
        lp = np.zeros(len(classes))
        for ff, y, p in prior_rows:
            if ff == f:
                lp[c_idx[y]] = p
        model[f] = {"classes": np.array(classes), "mu": mu, "var": var, "lp": lp}
    bmodel = spark.sparkContext.broadcast(model)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bmodel.value
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for f, grp in pdf.groupby("fold"):
                if int(f) not in m:
                    # fold with test rows but no training cells anywhere
                    # (model[f] skipped): the relational path emits no
                    # predictions for that fold — match, don't KeyError.
                    continue
                fm = m[int(f)]
                x = np.stack(grp["vec"].to_numpy())
                scores = np.empty((len(grp), len(fm["classes"])))
                for ci in range(len(fm["classes"])):
                    ll = (
                        -0.5 * (_LN_2PI + np.log(fm["var"][ci]))
                        - (x - fm["mu"][ci]) ** 2 / (2.0 * fm["var"][ci])
                    )
                    np.maximum(ll, -1e4, out=ll)  # same degenerate-var clamp
                    # half-away-from-zero, NOT np.rint (ties-to-even):
                    # Spark/DuckDB round() ties away from zero, and an
                    # exact-half ll*Q30 under rint would put this kernel
                    # one grid step off the relational twin / oracle.
                    q = np_round_half_away(ll * Q30).sum(axis=1)
                    scores[:, ci] = q / float(Q30) + fm["lp"][ci]
                # argmax returns the FIRST max: classes ascending ==
                # the relational score-DESC-then-cls-ASC tie-break
                pred = fm["classes"][np.argmax(scores, axis=1)]
                out.append(pd.DataFrame(
                    {"fold": int(f), "y": grp["y"].to_numpy(), "pred": pred}
                ))
            if out:  # every fold skipped → no predictions this batch
                yield pd.concat(out, ignore_index=True)

    # fold as long: the relational twin's fold (md5_bucket modulo) is
    # bigint, and the driver's dtype-strict compare flags int32 vs the
    # oracle's int64.
    pred = base.select("fold", "y", "vec").mapInPandas(
        score, "fold long, y long, pred long"
    )
    return _fold_accuracy(pred)
