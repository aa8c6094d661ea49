"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; random-
hyperplane LSH bucketing as the scale path (candidates only meet
inside a bucket, so the quadratic term shrinks by the bucket count).

Everything is JVM-side array HOF math with sequential left folds, so
the DuckDB oracle reproduces scores bit-for-bit. Hyperplanes are
pseudo-random but *portable*: component (j,d) is derived from
md5('hp' || j ':' d) — any engine regenerates the same planes
(same discipline as the split seeds, SURVEY §4.2a).

Scale notes: brute-force is O(Q·N) — fine for Q small (a probe set)
even at large N because it is a broadcast of Q against a scan of N
with no shuffle; full N×N similarity must go through LSH (or IVF)
bucketing, never a crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import cosine, to_double


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` is broadcast (small probe set); the corpus is scanned
    once, no shuffle until the per-query top-k window.
    """
    q = queries.select(
        F.col(key_col).alias("q_id"), to_double(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(key_col).alias("n_id"), to_double(vec_col).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", cosine("q_vec", "n_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", F.col("rk").cast("long").alias("rk"))
    )


def _plane_component(j: int, d: int, salt: str) -> float:
    """Driver-side twin of md5_unit(f'{j}:{d}', salt) - 0.5.

    int/2^48 division and the 0.5 subtraction are exact IEEE ops on
    exactly-representable operands, so this equals the in-plan
    md5_unit expression (and the DuckDB oracle) bit-for-bit.
    """
    import hashlib

    h = hashlib.md5(f"{salt}{j}:{d}".encode()).hexdigest()[:12]
    return int(h, 16) / float(16**12) - 0.5


def hyperplane_signature(vec_col, bits: int = 8, salt: str = "hp", dim: int = 64):
    """LSH bucket id in [0, 2^bits): sign pattern of `bits` pseudo-
    random hyperplane projections.

    Plane component (j, d) = md5_unit('hp' || j ':' d) - 0.5 — fully
    determined by (salt, j, d), so any engine regenerates it. Being
    row-independent, the plane matrix is precomputed driver-side and
    embedded as literals (the in-plan md5 variant re-hashed bits×dim
    times per ROW inside interpreted HOF lambdas — measured ~6x
    slower end-to-end). `dim` must equal the vector length: zip_with
    null-pads a shorter side, zeroing affected sign bits. The
    projection is a sequential left fold over dimensions: bit-exact.
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def proj(j: int):
        plane = F.array(*[F.lit(_plane_component(j, d, salt)) for d in range(dim)])
        return F.aggregate(
            F.zip_with(vec, plane, lambda x, p: x * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(proj(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def lsh_near_dup_pairs(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    threshold: float = 0.0,
) -> DataFrame:
    """Embedding near-duplicate pairs: same LSH bucket AND cosine ≥ t.

    The bucket self-join replaces the N² crossJoin with Σ_b |b|² work.
    """
    sig = emb.select(
        F.col(key_col).alias("id"),
        to_double(vec_col).alias("vec"),
        hyperplane_signature(to_double(vec_col), bits).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine("a.vec", "b.vec").alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    n_iter: int = 1,
    nprobe: int = 2,
    topk: int = 3,
    salt: str = "ivf",
) -> DataFrame:
    """IVF-style ANN: coarse KMeans quantizer, probe the `nprobe`
    nearest cells per query, exact cosine only within probed cells.

    The scale path for large Q: candidate count drops from N per
    query to ~N·nprobe/k_clusters, and both sides shuffle only on the
    small cluster key. Fully deterministic (md5-seeded quantizer), so
    the DuckDB oracle replays it end to end.
    """
    from ae_data_integration_spark.operators.kmeans import kmeans_fit

    assigned, centroids = kmeans_fit(
        emb, key_col, vec_col, k=k_clusters, n_iter=n_iter, salt=salt
    )
    data = assigned.select("id", "vec", "cluster")

    q = queries.select(
        F.col(key_col).alias("q_id"), to_double(vec_col).alias("q_vec")
    )
    qd = q.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist",
        F.aggregate(
            F.zip_with("q_vec", "centroid", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )
    wq = Window.partitionBy("q_id").orderBy("cdist", "cluster")
    probes = (
        qd.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("q_id", "q_vec", "cluster")
    )
    cand = probes.join(data, "cluster").filter(F.col("id") != F.col("q_id"))
    scored = cand.withColumn("cos", cosine("q_vec", "vec"))
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos"), "id")
    return (
        scored.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= topk)
        .select("q_id", F.col("id").alias("n_id"), "cos", F.col("rk").cast("long").alias("rk"))
    )
