"""Stratified splits and k-fold assignment (SURVEY §2.3 R1/R2/R4).

Reference semantics being reproduced:
- R1 stratified train/test: per class c, draw exactly round(n_c * p)
  training rows without replacement, test = complement
  (Evaluation_Auxiliary/Data_prep.py:16-58, np.random.seed(42)).
- R2 KFold(n_splits=5, shuffle=True) (CNC_AE_model_selection.py:346-358).

Scale-first design: a seeded RNG over row positions cannot be
reproduced on a cluster (row order is partition-dependent), so the
engine derives the shuffle from md5(row key) — uniform, deterministic
under any partitioning, and oracle-verifiable. Exact per-class counts
use row_number() over (partition by label order by md5) compared to
round(n_c * p) where n_c comes from a broadcast groupBy-count — the
per-class window is fine at scale because each class partition is
processed in parallel (classes ≫ 1 executor only if one class is the
whole table; salting would apply then).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.hashing import md5_bucket, md5_rank


def stratified_split(
    df: DataFrame,
    label_col: str,
    key_col: str,
    train_prop: float = 0.8,
    salt: str = "42",
) -> DataFrame:
    """Add an ``is_train`` flag: exactly round(n_c*p) train rows per class.

    `salt` is the portable analogue of np.random.seed(42).
    """
    w = Window.partitionBy(label_col).orderBy(md5_rank(key_col, salt), F.col(key_col))
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n_c"))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(counts), on=label_col)
        .withColumn(
            "is_train",
            F.col("_rk") <= F.round(F.col("_n_c") * F.lit(train_prop)).cast("int"),
        )
        .drop("_rk", "_n_c")
    )


def kfold(df: DataFrame, key_col: str, n_splits: int = 5, salt: str = "21") -> DataFrame:
    """Add a ``fold`` column in [0, n_splits).

    Balanced variant of KFold(shuffle=True): fold = (shuffled rank) mod k
    gives exact ±1-balanced folds like sklearn; the cheaper hash-bucket
    variant (`md5_bucket`) is statistically balanced only — we use the
    rank form for parity with the reference's KFold sizes.
    """
    w = Window.orderBy(md5_rank(key_col, salt), F.col(key_col))
    # NOTE: a global row_number window is a single-task sort. Fine for
    # fold assignment over training *samples* (the reference's scale —
    # thousands of rows); for billion-row fold assignment use
    # `kfold_hashed` below, which is fully parallel.
    return df.withColumn("fold", ((F.row_number().over(w) - 1) % n_splits).cast("long"))


def kfold_hashed(df: DataFrame, key_col: str, n_splits: int = 5, salt: str = "21") -> DataFrame:
    """Scale path: fold from md5 bucket — no global sort, folds are
    statistically (not exactly) balanced."""
    return df.withColumn("fold", md5_bucket(key_col, n_splits, salt))


def train_subset(df: DataFrame, fold: int) -> DataFrame:
    """R4: training subset for one CV fold."""
    return df.filter(F.col("fold") != fold)


def val_subset(df: DataFrame, fold: int) -> DataFrame:
    return df.filter(F.col("fold") == fold)
