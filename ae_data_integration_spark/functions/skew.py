"""Skew mitigation: salting for hot keys (SURVEY §4.2, brief §scale).

AQE's skew-join splitting handles sort-merge joins automatically;
salting is the explicit tool for (a) skewed *aggregations* (a hot
groupBy key funnels into one task) and (b) broadcast-incompatible
skewed joins. Pattern:

  aggregate:  two-level — groupBy(key, salt) partial, then groupBy(key)
  join:       salt the skewed side N ways, explode the other side ×N

Salts derive from md5(row key) — deterministic, so results stay
reproducible (same discipline as the splits)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.hashing import md5_bucket
from ae_data_integration_spark.functions.portable import fp


def with_salt(df: DataFrame, row_key: Column | str, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from the row's unique key."""
    return df.withColumn(salt_col, md5_bucket(row_key, n_salts, salt="skew"))


def salted_fpsum(
    df: DataFrame,
    group_key: str,
    value_col: str,
    q: int,
    row_key: str,
    n_salts: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-level skew-proof sum: partials per (key, salt) spread a hot
    key over n_salts tasks; the second level combines n_salts rows per
    key. Fixed-point, so the result equals the unsalted sum exactly.
    """
    partial = (
        with_salt(df, row_key, n_salts)
        .groupBy(group_key, "_salt")
        .agg(F.sum(fp(value_col, q)).alias("_p"))
    )
    return partial.groupBy(group_key).agg(
        (F.sum("_p") / F.lit(float(q))).alias(out_col)
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    row_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join a skewed fact side against a modest dimension without
    broadcast: the fact side salts its key; the dimension replicates
    ×n_salts so every (key, salt) partition finds its match. Falls
    back to the same row multiplicity as the plain join."""
    s = with_salt(skewed, row_key, n_salts)
    repl = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return s.join(repl, [on, "_salt"]).drop("_salt")
