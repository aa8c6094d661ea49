"""Array/vector math queries (SURVEY §2.4 N2, §2.5 J*, §2.7 A*).

The engine's replacement for the reference's row-wise numpy/torch
algebra, expressed entirely with JVM-side array higher-order
functions (functions/arrays.py). Every fold is a sequential left
fold, so Spark and DuckDB produce bit-identical doubles — these
queries are compared *unrounded*.

DuckDB equivalences used in the oracles:
  Spark F.aggregate(xs, 0.0, (a,x)->a+x)  ==  list_reduce(xs, (a,b)->a+b)
  Spark F.zip_with(a,b,f)                 ==  list_transform(list_zip(a,b), p -> f(p[1],p[2]))
  Spark F.slice(a, i, n)                  ==  a[i : i+n-1]  (1-based inclusive)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.portable import Q30, Q40, fpavg, fpsum
from ae_data_integration_spark.functions.arrays import (
    cosine,
    dot,
    l2_norm,
    l2_normalize,
    mean_fuse,
    recon_loss_row,
    slice_features,
    to_double,
)
from ae_data_integration_spark.tables import table

# DuckDB fragment: embedding cast to DOUBLE[] (parquet stores FLOAT[]).
_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sqsum(arr_sql: str) -> str:
    return f"list_reduce(list_transform({arr_sql}, x -> x * x), (a, b) -> a + b)"


def _dot(a_sql: str, b_sql: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a_sql}, {b_sql}),"
        f" p -> p[1] * p[2]), (a, b) -> a + b)"
    )


# --- N2: row L2 normalization ------------------------------------------------

_N2_SQL = f"""
SELECT vec_id,
       sqrt({_sqsum(_D)}) AS l2,
       CAST(embedding[1] AS DOUBLE) / greatest(sqrt({_sqsum(_D)}), 1e-12) AS first_normed
FROM embeddings
ORDER BY vec_id
"""


@register("y_n2_l2_normalize", oracle=_N2_SQL,
          doc="torch F.normalize(p=2, dim=1) parity (ref CNC_AE_model_selection.py:219-225).",
          tags=("arrays",))
def n2_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    arr = to_double("embedding")
    return e.select(
        "vec_id",
        l2_norm(arr).alias("l2"),
        F.element_at(l2_normalize(arr), 1).alias("first_normed"),
    ).orderBy("vec_id")


# --- P7 + J1: slice two views out of the vector, dot + cosine ---------------

_J1_SQL = f"""
SELECT vec_id,
       {_dot(f"list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))",
             f"list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))")} AS v1_dot_v2,
       {_dot(f"list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))",
             f"list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))")}
         / greatest(sqrt({_sqsum("list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))")})
                    * sqrt({_sqsum("list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))")}),
                    1e-12) AS v1_cos_v2
FROM embeddings
ORDER BY vec_id
"""


@register("y_j1_slice_dot_cosine", oracle=_J1_SQL,
          doc="Column-range slice (ref mocss.py:465-478) + row dot/cosine (L6/L9).",
          tags=("arrays",))
def j1_slice_dot_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    arr = to_double("embedding")
    v1 = slice_features(arr, 1, 32)
    v2 = slice_features(arr, 33, 32)
    return e.select(
        "vec_id",
        dot(v1, v2).alias("v1_dot_v2"),
        cosine(v1, v2).alias("v1_cos_v2"),
    ).orderBy("vec_id")


# --- A2: per-subject reconstruction loss over a paired view -----------------
# Pairs consecutive vectors (vec_id, vec_id+1) via an equi-join — the
# engine analogue of (s, s_hat).

_A2_SQL = f"""
SELECT a.vec_id,
       sqrt(list_reduce(
         list_transform(list_zip(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                 list_transform(b.embedding, x -> CAST(x AS DOUBLE))),
                        p -> (p[1] - p[2]) * (p[1] - p[2])),
         (x, y) -> x + y)) AS recon_loss
FROM embeddings a
JOIN embeddings b ON b.vec_id = a.vec_id + 1
ORDER BY a.vec_id
"""


@register("y_a2_recon_loss", oracle=_A2_SQL,
          doc="Per-row sqrt(sum((a-b)^2)) (ref reconloss_from_retrained_models.py:45,69-72).",
          tags=("arrays", "loss"))
def a2_recon_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    a = e.select("vec_id", to_double("embedding").alias("x"))
    b = e.select((F.col("vec_id") - 1).alias("vec_id"), to_double("embedding").alias("xhat"))
    return (
        a.join(b, "vec_id")
        .select("vec_id", recon_loss_row("x", "xhat").alias("recon_loss"))
        .orderBy("vec_id")
    )


# --- A3: orthogonality loss v1 — global mean of per-row dot -----------------

_A3_SQL = f"""
SELECT (SUM(CAST(round((
         {_dot("list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))",
               "list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))")}
       ) * 1073741824) AS BIGINT)) / 1073741824.0)
       / CAST(COUNT(*) AS DOUBLE) AS ortho_v1v2
FROM embeddings
"""


@register("y_a3_ortho_mean", oracle=_A3_SQL,
          doc="mean(z12 ⊙ z1) orthogonality (ref JISAE-O1_selection.py:281-293); "
              "fixed-point-exact global mean.",
          tags=("arrays", "loss"))
def a3_ortho_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    arr = to_double("embedding")
    row_dot = dot(slice_features(arr, 1, 32), slice_features(arr, 33, 32))
    return e.agg(fpavg(row_dot, Q30).alias("ortho_v1v2"))


# --- J4: mean-of-shared fusion + L2 of fused vector -------------------------

_J4_SQL = f"""
SELECT vec_id,
       sqrt(list_reduce(
         list_transform(
           list_transform(list_zip(list_transform(embedding[1:32], x -> CAST(x AS DOUBLE)),
                                   list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))),
                          p -> (p[1] + p[2]) / 2.0),
           x -> x * x),
         (a, b) -> a + b)) AS fused_l2
FROM embeddings
ORDER BY vec_id
"""


@register("y_j4_mean_fuse", oracle=_J4_SQL,
          doc="(shared1+shared2)/2 fusion (ref embedding_from_retrained_models.py:73-84).",
          tags=("arrays", "fusion"))
def j4_mean_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    arr = to_double("embedding")
    fused = mean_fuse(slice_features(arr, 1, 32), slice_features(arr, 33, 32))
    return e.select("vec_id", l2_norm(fused).alias("fused_l2")).orderBy("vec_id")


# --- A5: per-dimension (column) dot products — explode + groupBy ------------
# JISAE-O3's column-wise orthogonality: dot over the *sample* axis per
# embedding dimension. Relationally: posexplode + groupBy(dim) with
# decimal-exact sums (partition-order independent).

_A5_SQL = """
SELECT dim,
       (SUM(CAST(round((v1 * v2) * 1099511627776) AS BIGINT)) / 1099511627776.0) AS col_dot
FROM (
  SELECT generate_subscripts(embedding[1:32], 1) AS dim,
         unnest(list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))) AS v1,
         unnest(list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))) AS v2
  FROM embeddings
)
GROUP BY dim
ORDER BY dim
"""


@register("y_a5_ortho_coldot", oracle=_A5_SQL,
          doc="Per-dimension dot over samples (ref JISAE-O3_selection.py:281-300).",
          tags=("arrays", "loss"))
def a5_ortho_coldot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    arr = to_double("embedding")
    pairs = F.arrays_zip(
        slice_features(arr, 1, 32).alias("v1"), slice_features(arr, 33, 32).alias("v2")
    )
    return (
        e.select(F.posexplode(pairs).alias("i", "p"))
        .select((F.col("i") + 1).cast("long").alias("dim"), (F.col("p.v1") * F.col("p.v2")).alias("prod"))
        .groupBy("dim")
        .agg(fpsum("prod", Q40).alias("col_dot"))
        .orderBy("dim")
    )


# --- A4: orthogonality loss v2 — sum of squared per-row dots ----------------

_A4_SQL = f"""
SELECT (SUM(CAST(round((
         {_dot("list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))",
               "list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))")}
         * {_dot("list_transform(embedding[1:32], x -> CAST(x AS DOUBLE))",
                 "list_transform(embedding[33:64], x -> CAST(x AS DOUBLE))")}
       ) * 1048576) AS BIGINT)) / 1048576.0) AS ortho_sq
FROM embeddings
"""


@register("y_a4_ortho_rowdot_sq", oracle=_A4_SQL,
          doc="Σ diag(z12 z1ᵀ)² per-sample squared dots (ref JISAE-O2_selection.py:281-305).",
          tags=("arrays", "loss"))
def a4_ortho_rowdot_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.portable import Q20

    e = table(spark, sf_dir, "embeddings")
    arr = to_double("embedding")
    row_dot = dot(slice_features(arr, 1, 32), slice_features(arr, 33, 32))
    return e.agg(fpsum(row_dot * row_dot, Q20).alias("ortho_sq"))
