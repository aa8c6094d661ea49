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
from ae_data_integration_spark.functions.caching import persist_tracked

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


def _check_munkres_vs_bruteforce(sdf, spark, sf_dir: str) -> str:
    """Semantic contract: the scipy-Hungarian accuracy must equal an
    INDEPENDENT assignment optimum — contingency rebuilt by a DuckDB
    md5 replay of the pred column (no Spark involved), optimum by a
    Held-Karp bitmask DP over pred subsets (2^k * k * |labels| ops,
    vs the factorial permutations enumeration this replaced: 10! =
    3.6M perms, ~7 s per parity run). Exact float equality: both
    sides compute matched/n from the same integers."""
    import os

    import duckdb

    path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH p AS (
          SELECT label,
                 CASE WHEN CAST(('0x' || substr(md5('noise' || CAST(vec_id AS VARCHAR)), 1, 12)) AS BIGINT)
                           / 281474976710656.0 < 0.3
                      THEN CAST(CAST(('0x' || substr(md5('alt' || CAST(vec_id AS VARCHAR)), 1, 12)) AS BIGINT) % 10 AS INT)
                      ELSE label END AS pred
          FROM read_parquet('{path}')
        )
        SELECT label, pred, COUNT(*) AS n FROM p GROUP BY 1, 2
    """).fetchall()
    con.close()
    ct = {(lab, pr): n for lab, pr, n in rows}
    labels = sorted({lab for lab, _, _ in rows})
    preds = sorted({pr for _, pr, _ in rows})
    n_total = sum(ct.values())
    # dp[mask] = best matched mass assigning the labels processed so
    # far to the pred subset `mask`, each label using at most one pred
    # (the skip transition). Skipping contributes 0, which matches the
    # rectangular-Hungarian optimum for non-negative weights — and
    # makes distinct-preds < distinct-labels well-defined (the old
    # permutations max() raised ValueError on an empty iterator there).
    k = len(preds)
    dp = [0] * (1 << k)
    for lab in labels:
        ndp = dp[:]  # skip-this-label transition
        for mask in range(1 << k):
            base = dp[mask]
            for j in range(k):
                bit = 1 << j
                if not mask & bit:
                    v = base + ct.get((lab, preds[j]), 0)
                    if v > ndp[mask | bit]:
                        ndp[mask | bit] = v
        dp = ndp
    best = max(dp)
    want = best / n_total
    got = float(sdf["munkres_accuracy"].iloc[0])
    if got != want:
        return f"scipy Hungarian accuracy {got!r} != brute-force optimum {want!r}"
    return ""


@register("z_c4_munkres_accuracy", oracle=None,
          doc="Hungarian-matched clustering accuracy (ref evaluation.py:34-53); "
              "k×k assignment on the driver; no SQL oracle but semantically "
              "contracted: must equal a brute-force assignment optimum over "
              "a DuckDB md5-replayed contingency.",
          tags=("metrics",),
          min_rows=1, columns=("munkres_accuracy",),
          check=_check_munkres_vs_bruteforce)
def c4_munkres_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return munkres_accuracy(_pred_df(spark, sf_dir), "label", "pred")


# --- C4b (oracled): assignment-exact matched accuracy for small k -----------
# The Hungarian step (z_c4) is driver-side for general k; for the
# small cluster counts the reference actually evaluates (k<=5,
# mocss.py), the optimal assignment is computable RELATIONALLY by
# enumerating all injective pred->label maps (P(5,4) = 120 rows from
# nested self-joins of the label set) and taking the max matched
# mass — integer arithmetic end to end, so the optimum itself sits
# under the value-hash gate.

_C4B_PRED = """
  SELECT label,
         CAST(CAST(('0x' || substr(md5('alt4' || CAST(vec_id AS VARCHAR)), 1, 12)) AS BIGINT) % 4 AS INT) AS pred
  FROM embeddings
"""

_C4B_SQL = f"""
WITH p AS ({_C4B_PRED}),
ct AS (SELECT label, pred, COUNT(*) AS n_ij FROM p GROUP BY label, pred),
labs AS (SELECT DISTINCT label AS m FROM p),
inj AS (
  SELECT a.m AS m0, b.m AS m1, c.m AS m2, d.m AS m3
  FROM labs a, labs b, labs c, labs d
  WHERE b.m != a.m AND c.m != a.m AND c.m != b.m
    AND d.m != a.m AND d.m != b.m AND d.m != c.m
),
scored AS (
  SELECT coalesce(c0.n_ij, 0) + coalesce(c1.n_ij, 0)
       + coalesce(c2.n_ij, 0) + coalesce(c3.n_ij, 0) AS s
  FROM inj
  LEFT JOIN ct c0 ON c0.pred = 0 AND c0.label = inj.m0
  LEFT JOIN ct c1 ON c1.pred = 1 AND c1.label = inj.m1
  LEFT JOIN ct c2 ON c2.pred = 2 AND c2.label = inj.m2
  LEFT JOIN ct c3 ON c3.pred = 3 AND c3.label = inj.m3
)
SELECT CAST(MAX(s) AS BIGINT) AS matched,
       CAST(MAX(s) AS DOUBLE) / (SELECT COUNT(*) FROM p) AS matched_accuracy
FROM scored
"""


@register("c4b_matched_exact", oracle=_C4B_SQL,
          doc="Assignment-exact matched clustering accuracy for small k: "
              "enumerate all injective pred->label maps (nested self-joins "
              "of the label set, P(5,4)=120 rows) and take the max matched "
              "mass — the Hungarian optimum as pure relational integer "
              "arithmetic (ref evaluation.py:34-53; z_c4 stays the "
              "general-k scipy-checked path).",
          tags=("metrics",))
def c4b_matched_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    p = e.select(
        "label", md5_bucket("vec_id", 4, salt="alt4").cast("int").alias("pred")
    )
    ct = (
        p.groupBy("label", "pred").agg(F.count(F.lit(1)).alias("n_ij")).transform(persist_tracked)
    )
    labs = ct.select(F.col("label").alias("m")).distinct()
    inj = (
        labs.select(F.col("m").alias("m0"))
        .crossJoin(labs.select(F.col("m").alias("m1")))
        .filter(F.col("m1") != F.col("m0"))
        .crossJoin(labs.select(F.col("m").alias("m2")))
        .filter((F.col("m2") != F.col("m0")) & (F.col("m2") != F.col("m1")))
        .crossJoin(labs.select(F.col("m").alias("m3")))
        .filter(
            (F.col("m3") != F.col("m0"))
            & (F.col("m3") != F.col("m1"))
            & (F.col("m3") != F.col("m2"))
        )
    )
    scored = inj
    for i in range(4):
        ci = ct.filter(F.col("pred") == i).select(
            F.col("label").alias(f"m{i}"), F.col("n_ij").alias(f"n{i}")
        )
        scored = scored.join(F.broadcast(ci), f"m{i}", "left")
    s = sum(F.coalesce(F.col(f"n{i}"), F.lit(0)) for i in range(4))
    n_total = p.count()
    return scored.agg(
        F.max(s).cast("long").alias("matched"),
        (F.max(s).cast("double") / F.lit(float(n_total))).alias("matched_accuracy"),
    )
