"""Data-prep queries: stratified splits, k-fold, scaling, encoding.

These exercise the operator library (operators/splits.py,
operators/scale.py) that re-expresses the reference's prep layer
(Evaluation_Auxiliary/Data_prep.py, CNC_AE_model_selection.py:402-470)
as partition-independent Spark plans. Reproducibility comes from
md5(salt || key) ordering — the portable analogue of the reference's
np.random.seed(42)/seed(21) discipline (SURVEY §4.2a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.portable import Q40, fpavg
from ae_data_integration_spark.operators.scale import (
    label_encode,
    mean_center,
    minmax_scale_scalar,
)
from ae_data_integration_spark.operators.splits import kfold, kfold_hashed, stratified_split
from ae_data_integration_spark.tables import table

# --- R1: stratified 80/20 split, exact per-class counts ---------------------

_R1_SQL = """
WITH ranked AS (
  SELECT c_mktsegment,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5('42' || CAST(c_custkey AS VARCHAR)), c_custkey) AS rk,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_c
  FROM customer
)
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE rk <= CAST(round(n_c * 0.8) AS INT)) AS n_train,
       COUNT(*) FILTER (WHERE rk >  CAST(round(n_c * 0.8) AS INT)) AS n_test
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("r1_stratified_split", oracle=_R1_SQL,
          doc="Exact-count stratified split via md5 rank (ref Data_prep.py:16-58, seed 42).",
          tags=("prep", "split"))
def r1_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    split = stratified_split(c, "c_mktsegment", "c_custkey", train_prop=0.8, salt="42")
    return (
        split.groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("is_train"), 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("is_train"), 0).otherwise(1)).alias("n_test"),
        )
        .orderBy("c_mktsegment")
    )


# --- R2: exact balanced k-fold (rank mod k) ---------------------------------

_R2_SQL = """
SELECT fold, COUNT(*) AS n
FROM (
  SELECT (ROW_NUMBER() OVER (ORDER BY md5('21' || CAST(c_custkey AS VARCHAR)), c_custkey) - 1) % 5 AS fold
  FROM customer
)
GROUP BY fold
ORDER BY fold
"""


@register("r2_kfold_exact", oracle=_R2_SQL,
          doc="KFold(5, shuffle=True) parity: exact ±1-balanced folds (ref CNC_AE_model_selection.py:346-358).",
          tags=("prep", "split"))
def r2_kfold_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return kfold(c, "c_custkey", n_splits=5, salt="21").groupBy("fold").agg(
        F.count(F.lit(1)).alias("n")
    ).orderBy("fold")


# --- R2b: hashed k-fold (fully parallel scale path) -------------------------

_R2B_SQL = """
SELECT fold, COUNT(*) AS n
FROM (
  SELECT CAST(('0x' || substr(md5('21' || CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) % 5 AS fold
  FROM orders
)
GROUP BY fold
ORDER BY fold
"""


@register("r2_kfold_hashed", oracle=_R2B_SQL,
          doc="Hash-bucket fold assignment: no global sort, cluster-scale path.",
          tags=("prep", "split"))
def r2_kfold_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return kfold_hashed(o, "o_orderkey", n_splits=5, salt="21").groupBy("fold").agg(
        F.count(F.lit(1)).alias("n")
    ).orderBy("fold")


# --- N1: per-group min-max scaling ------------------------------------------

_N1_SQL = """
SELECT c_custkey,
       CASE WHEN hi = lo THEN 0.0 ELSE (c_acctbal - lo) / (hi - lo) END AS c_acctbal_scaled
FROM customer
JOIN (
  SELECT c_nationkey AS nk, MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
  FROM customer GROUP BY c_nationkey
) s ON c_nationkey = s.nk
ORDER BY c_custkey
"""


@register("y_n1_minmax_scale", oracle=_N1_SQL,
          doc="MinMaxScaler as groupBy-agg + broadcast join (ref Data_prep.py:72-76).",
          tags=("prep", "scale"))
def n1_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        minmax_scale_scalar(c, "c_acctbal", by=["c_nationkey"])
        .select("c_custkey", "c_acctbal_scaled")
        .orderBy("c_custkey")
    )


# --- N3: mean-centering ------------------------------------------------------

_N3_SQL = """
SELECT o_orderkey,
       o_totalprice - (
         SELECT (SUM(CAST(round(o_totalprice * 1048576) AS BIGINT)) / 1048576.0)
                / CAST(COUNT(*) AS DOUBLE)
         FROM orders
       ) AS o_totalprice_centered
FROM orders
ORDER BY o_orderkey
"""


@register("y_n3_mean_center", oracle=_N3_SQL,
          doc="x - mean(x) with decimal-exact mean (ref mocss.py:40-41).",
          tags=("prep", "scale"))
def n3_mean_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        mean_center(o, "o_totalprice")
        .select("o_orderkey", "o_totalprice_centered")
        .orderBy("o_orderkey")
    )


# --- N4: label encoding ------------------------------------------------------

_N4_SQL = """
SELECT c.c_mktsegment, d.label_id, COUNT(*) AS n
FROM customer c
JOIN (
  SELECT c_mktsegment, ROW_NUMBER() OVER (ORDER BY c_mktsegment) - 1 AS label_id
  FROM (SELECT DISTINCT c_mktsegment FROM customer)
) d USING (c_mktsegment)
GROUP BY c.c_mktsegment, d.label_id
ORDER BY d.label_id
"""


@register("y_n4_label_encode", oracle=_N4_SQL,
          doc="Dense label codes via broadcast dim (ref Data_prep.py:86-91).",
          tags=("prep", "encode"))
def n4_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        label_encode(c, "c_mktsegment")
        .groupBy("c_mktsegment", "label_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label_id")
    )


# --- Flagship: the full prep pipeline (SURVEY §7 stage-1 slice) -------------
# stratified seed-42 split → per-split min-max scale (the reference's
# refit-per-split quirk, Data_prep.py:72-76) → label encode → per-class
# summary. This is the exact prep of CNC_AE_model_selection.py:501-524
# re-expressed relationally.

_PREP_SQL = """
WITH ranked AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5('42' || CAST(c_custkey AS VARCHAR)), c_custkey) AS rk,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_c
  FROM customer
),
split AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         rk <= CAST(round(n_c * 0.8) AS INT) AS is_train
  FROM ranked
),
scaled AS (
  SELECT s.*,
         CASE WHEN st.hi = st.lo THEN 0.0
              ELSE (s.c_acctbal - st.lo) / (st.hi - st.lo) END AS acctbal_scaled
  FROM split s
  JOIN (
    SELECT c_mktsegment AS seg, is_train AS tr, MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
    FROM split GROUP BY seg, tr
  ) st ON s.c_mktsegment = st.seg AND s.is_train = st.tr
),
encoded AS (
  SELECT c_mktsegment, ROW_NUMBER() OVER (ORDER BY c_mktsegment) - 1 AS label_id
  FROM (SELECT DISTINCT c_mktsegment FROM split)
)
SELECT sc.c_mktsegment, e.label_id, sc.is_train,
       COUNT(*) AS n,
       (SUM(CAST(round(sc.acctbal_scaled * 1099511627776) AS BIGINT)) / 1099511627776.0)
         / CAST(COUNT(*) AS DOUBLE) AS avg_scaled
FROM scaled sc JOIN encoded e USING (c_mktsegment)
GROUP BY sc.c_mktsegment, e.label_id, sc.is_train
ORDER BY e.label_id, sc.is_train
"""


@register("prep_pipeline", oracle=_PREP_SQL,
          doc="Flagship prep slice: split+scale+encode+summarize "
              "(ref CNC_AE_model_selection.py:501-524).",
          tags=("prep", "flagship", "bench"))
def prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    split = stratified_split(c, "c_mktsegment", "c_custkey", train_prop=0.8, salt="42")
    # Refit-per-split quirk: scale train and test independently.
    scaled = minmax_scale_scalar(
        split, "c_acctbal", by=["c_mktsegment", "is_train"], out_col="acctbal_scaled"
    )
    encoded = label_encode(scaled, "c_mktsegment")
    return (
        encoded.groupBy("c_mktsegment", "label_id", "is_train")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fpavg("acctbal_scaled", Q40).alias("avg_scaled"),
        )
        .orderBy("label_id", "is_train")
    )


# --- N5b: dispersion statistics (SURVEY §2.10 — np.mean/np.std ddof=0) ------
# stddev_pop's internal accumulation is partition-order dependent, so
# the portable form assembles variance from fixed-point moments:
# var = E[x²] − E[x]² (population, matching numpy's default ddof=0).

_N5_SQL = """
SELECT o_orderpriority,
       (SUM(CAST(round(o_totalprice * 1048576) AS BIGINT)) / 1048576.0)
         / CAST(COUNT(*) AS DOUBLE) AS mean_price,
       sqrt(
         (SUM(CAST(round(o_totalprice * o_totalprice * 16) AS BIGINT)) / 16.0)
           / CAST(COUNT(*) AS DOUBLE)
         - ((SUM(CAST(round(o_totalprice * 1048576) AS BIGINT)) / 1048576.0)
              / CAST(COUNT(*) AS DOUBLE))
           * ((SUM(CAST(round(o_totalprice * 1048576) AS BIGINT)) / 1048576.0)
                / CAST(COUNT(*) AS DOUBLE))
       ) AS std_pop_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("y_n5_dispersion", oracle=_N5_SQL,
          doc="Portable mean/stddev_pop from fixed-point moments "
              "(np.std ddof=0 convention, ref AE_results.ipynb cells 26-32).",
          tags=("prep", "agg"))
def n5_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.portable import Q20, fp, fpavg

    o = table(spark, sf_dir, "orders")
    # x² of ~1e5-scale prices needs a coarser quantum to keep the
    # accumulator in range: q=16 (~0.06 grid on values up to ~1e10).
    q2 = 16
    mean = fpavg("o_totalprice", Q20)
    ex2 = (F.sum(fp(F.col("o_totalprice") * F.col("o_totalprice"), q2)) / F.lit(float(q2))) / F.count(
        F.lit(1)
    ).cast("double")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            mean.alias("mean_price"),
            F.sqrt(ex2 - mean * mean).alias("std_pop_price"),
        )
        .orderBy("o_orderpriority")
    )
