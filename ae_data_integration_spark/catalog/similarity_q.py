"""Similarity-search queries over the embeddings table.

Brute-force cosine top-k (correctness baseline) and random-
hyperplane-LSH bucketed near-dup pairs (scale path). Hyperplanes are
md5-derived, so DuckDB regenerates them bit-for-bit (operators/
similarity.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.operators.similarity import brute_force_topk, lsh_near_dup_pairs
from ae_data_integration_spark.tables import table

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sq(a: str) -> str:
    return f"list_reduce(list_transform({a}, x -> x * x), (p, q) -> p + q)"


def _dotp(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
        f" (x, y) -> x + y)"
    )


# --- S1: brute-force cosine top-10 ------------------------------------------

_S1_SQL = f"""
WITH e AS (SELECT vec_id, {_V} AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id AS n_id,
         {_dotp('q.qv', 'e.v')} / greatest(sqrt({_sq('q.qv')}) * sqrt({_sq('e.v')}), 1e-12) AS cos
  FROM q JOIN e ON e.vec_id != q.q_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM scored
) WHERE rk <= 10
ORDER BY q_id, rk
"""


@register("s1_ann_bruteforce", oracle=_S1_SQL,
          doc="Exact cosine top-10 for probe queries; broadcast Q × scan N, no shuffle.",
          tags=("similarity", "bench"))
def s1_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(e, q, k=10).orderBy("q_id", "rk")


# --- S1b: brute force with a FIXED probe budget ------------------------------
# s1's probe set (vec_id % 100 == 0) grows ∝ N, so its scale-leg
# growth column measures an O(N·Q)=O(N²/100) workload — 9.24× at 10×
# data said nothing about the engine (VERDICT r7). This twin pins
# Q = 20 probes (the sf0.1 probe count) at every scale factor, so its
# growth ratio isolates the engine's scan+broadcast scaling; s1 stays
# registered as the Q∝N stress but is excluded from bench scale legs.

_S1B_SQL = _S1_SQL.replace(
    "WHERE vec_id % 100 = 0", "WHERE vec_id % 100 = 0 AND vec_id < 2000"
)


@register("s1b_ann_fixed_probes", oracle=_S1B_SQL,
          doc="s1 with a FIXED 20-probe budget (vec_id % 100 == 0 and "
              "vec_id < 2000): broadcast Q × scan N with Q held constant "
              "across scale factors, so the bench growth column measures "
              "the corpus scan, not the probe-count arithmetic.",
          tags=("similarity", "bench"))
def s1b_ann_fixed_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return brute_force_topk(e, q, k=10).orderBy("q_id", "rk")


# --- S2: hyperplane-LSH bucketed near-dup pairs -----------------------------

_MD5U = (
    "CAST(('0x' || substr(md5('hp' || {key}), 1, 12)) AS BIGINT)"
    " / 281474976710656.0"
)


def _proj(j: str) -> str:
    unit = _MD5U.format(key=f"{j} || ':' || p[2]")
    return (
        f"list_reduce(list_transform(list_zip(v, range(0, 64)),"
        f" p -> p[1] * ({unit} - 0.5)), (a, b) -> a + b)"
    )


_S2_SQL = f"""
WITH e AS (SELECT vec_id AS id, {_V} AS v FROM embeddings),
sig AS (
  SELECT id, v,
         list_reduce(
           list_transform(range(0, 8),
             j -> CASE WHEN {_proj('j')} > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END),
           (a, b) -> a + b) AS bucket
  FROM e
)
SELECT a.id AS id_a, b.id AS id_b,
       {_dotp('a.v', 'b.v')} / greatest(sqrt({_sq('a.v')}) * sqrt({_sq('b.v')}), 1e-12) AS cos
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.id < b.id
ORDER BY id_a, id_b
"""


@register("s2_lsh_near_dup", oracle=_S2_SQL,
          doc="Random-hyperplane LSH (8 bits, md5-derived planes): bucketed "
              "candidate pairs with exact cosine — the N² crossJoin killer.",
          tags=("similarity",))
def s2_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return (
        lsh_near_dup_pairs(e, bits=8, threshold=-1.0)
        .orderBy("id_a", "id_b")
    )


# --- S3: IVF ANN (coarse quantizer + probed cells) --------------------------

from ae_data_integration_spark.catalog.kmeans_q import _assign_cte, _update_cte
from ae_data_integration_spark.operators.similarity import ivf_topk


def _ivf_sql(k_clusters: int = 8, nprobe: int = 2, topk: int = 3) -> str:
    return f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS vec FROM embeddings),
init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('ivf' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts ORDER BY md5('ivf' || CAST(id AS VARCHAR)), id LIMIT {k_clusters})
),
{_assign_cte('pts', 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
q AS (SELECT id AS q_id, vec AS q_vec FROM pts WHERE id % 100 = 0),
qd AS (
  SELECT q.q_id, q.q_vec, c.cluster,
         list_reduce(list_transform(list_zip(q.q_vec, c.centroid),
                                    p -> (p[1]-p[2]) * (p[1]-p[2])), (x,y) -> x+y) AS cdist
  FROM q CROSS JOIN c1 c
),
probes AS (
  SELECT q_id, q_vec, cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cdist, cluster) AS rk FROM qd
  ) WHERE rk <= {nprobe}
),
cand AS (
  SELECT p.q_id, a.id AS n_id,
         {_dotp('p.q_vec', 'a.vec')}
           / greatest(sqrt({_sq('p.q_vec')}) * sqrt({_sq('a.vec')}), 1e-12) AS cos
  FROM probes p JOIN a2 a ON p.cluster = a.cluster AND a.id != p.q_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk FROM cand
) WHERE rk <= {topk}
ORDER BY q_id, rk
"""


@register("s3_ivf_topk", oracle=_ivf_sql(),
          doc="IVF ANN: md5-seeded coarse KMeans quantizer, nprobe=2 probed "
              "cells, exact cosine within cells — the large-Q scale path; "
              "oracle replays quantizer+probe+rank end to end.",
          tags=("similarity", "bench"))
def s3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(e, q, k_clusters=8, n_iter=1, nprobe=2, topk=3, salt="ivf").orderBy(
        "q_id", "rk"
    )
