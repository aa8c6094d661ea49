"""Clustering (SURVEY §2.8 C1/C5).

Two KMeans paths:

* `kmeans_mllib` — MLlib's KMeans (k-means|| init) on a Vector
  column: the production path (distributed, mature).
* `kmeans_relational` — Lloyd's algorithm unrolled for a fixed
  iteration count as pure DataFrame ops: md5-seeded deterministic
  init, broadcast centroids, argmin assignment via a rank window,
  fixed-point centroid means. Slower per iteration but 100%
  deterministic, engine-portable, and DuckDB-verifiable — the
  correctness anchor for the MLlib path (ref mocss.py:409
  KMeans(k).fit_predict).

Cluster-quality indices (C5): Calinski-Harabasz and Davies-Bouldin
as centroid-join aggregates (ref test_metrics.py:15-17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double
from ae_data_integration_spark.functions.hashing import md5_rank
from ae_data_integration_spark.functions.portable import Q30, Q40, fpsum
from ae_data_integration_spark.functions.caching import persist_tracked

_SQDIST = "sqdist"


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_expr(vec_col, cent_rows: list) -> F.Column:
    """struct(sqdist, cluster) of the nearest centroid, as ONE
    expression over a model-sized centroid list embedded as literals.

    Bit-identical to the former crossJoin+rank-window argmin: the
    per-centroid distance is the same zip_with/aggregate sequential
    fold (identical IEEE op sequence — zip_with against a literal
    array evaluates exactly as against a joined column), and
    array_min over struct(sqdist, cluster) is the same lexicographic
    (distance, cluster) tie-break the window's orderBy applied. What
    changes is only the plan: a single projection instead of a k-way
    row explosion + shuffle + sort — the per-assignment exchange was
    the dominant fixed cost of every Lloyd iteration at bench scale
    and shuffles k·N rows at any scale (guide §2.4: remove shuffles
    outright; the centroid side is model-sized by construction)."""
    # Built as ONE SQL-text expression (F.expr): constructing the same
    # tree node-by-node through the Python Column API costs ~0.8 s of
    # py4j round-trips per plan build (measured), the JVM-side parse
    # of the text form is ~free. CAST('<repr>' AS DOUBLE) round-trips
    # every centroid component exactly (shortest-repr parse is
    # correctly rounded on both sides).
    parts = []
    for r in sorted(cent_rows, key=lambda r: r["cluster"]):
        arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in r["centroid"])
        sq = (
            f"aggregate(zip_with({vec_col}, array({arr}), "
            "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + v)"
        )
        parts.append(
            f"named_struct('{_SQDIST}', {sq}, "
            f"'cluster', CAST({int(r['cluster'])} AS BIGINT))"
        )
    return F.expr(f"array_min(array({','.join(parts)}))")


def _assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: argmin by (distance, cluster) —
    deterministic under ties. The centroid table is model-sized
    (k×d) by contract everywhere, so it is collected and inlined as
    literals (see _assign_expr); callers may pass either a literal
    DataFrame (kmeans_fit's per-iteration tables) or a parquet-backed
    one (ann_index's stored coarse quantizer)."""
    rows = centroids.select("cluster", "centroid").collect()
    best = _assign_expr("vec", rows)
    # two-step select: the argmin struct is materialized once per row
    # and the field extraction lives in its own projection (Catalyst's
    # CollapseProject keeps non-cheap expressions single-evaluation)
    return points.select("id", "vec", best.alias("_mn")).select(
        "id",
        "vec",
        F.col("_mn.cluster").alias("cluster"),
        F.col(f"_mn.{_SQDIST}").alias(_SQDIST),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: fixed-point per-dimension means, reassembled in
    dim order (one narrow shuffle of k×d rows)."""
    long = assigned.select("cluster", F.posexplode("vec").alias("dim", "x"))
    means = long.groupBy("cluster", "dim").agg(
        (fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("m")
    )
    return (
        means.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_dm"))
        .select(
            "cluster", F.transform("_dm", lambda s: s["m"]).alias("centroid")
        )
    )


def kmeans_fit(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_iter: int = 2,
    salt: str = "km",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's for `n_iter` iterations; returns (assignment, centroids).

    Init = the k rows with smallest md5(salt‖key) — the portable
    seeded random choice (SURVEY §4.2a).
    """
    # Iterative algorithm: the points projection is read by every
    # assign pass (n_iter + 1 of them) and Spark does not CSE common
    # scan subtrees within one plan — persist it once, as MLlib's own
    # iterative fitters cache their input.
    points = df.select(
        F.col(key_col).alias("id"), to_double(vec_col).alias("vec")
    ).transform(persist_tracked)
    # Init = the k rows with smallest md5(salt‖key): a distributed
    # TopK (orderBy+limit is rewritten to TakeOrderedAndProject, no
    # global sort), enumerated on the driver — k×d doubles, the same
    # model-sized roundtrip as the per-iteration centroid collect.
    init_rows = (
        points.withColumn("_h", md5_rank(F.col("id"), salt))
        .orderBy("_h", "id")
        .limit(k)
        .select("vec")
        .collect()
    )
    init = points.sparkSession.createDataFrame(
        [(i, r["vec"]) for i, r in enumerate(init_rows)],
        "cluster long, centroid array<double>",
    )
    centroids = init
    for _ in range(n_iter):
        centroids = _update(_assign(points, centroids))
        # Materialize the k×d centroid table to the driver and rebuild
        # it as a literal DataFrame — MLlib's Lloyd's does the same
        # per-iteration roundtrip. Breaks the otherwise-exponential
        # lineage growth (each assign would re-derive every earlier
        # iteration, including the init TopK sort, inside one plan)
        # while moving only model-sized data. Exact: doubles round-trip
        # bit-for-bit through collect/createDataFrame.
        centroids = points.sparkSession.createDataFrame(
            centroids.collect(), centroids.schema
        )
    return _assign(points, centroids), centroids


def kmeans_relational(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_iter: int = 2,
    salt: str = "km",
) -> DataFrame:
    """Final Lloyd's assignment (id, cluster, sqdist) — see kmeans_fit."""
    assigned, _ = kmeans_fit(df, key_col, vec_col, k, n_iter, salt)
    return assigned


def kmeans_mllib(
    df: DataFrame, key_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, seed: int = 42, with_sqdist: bool = False,
) -> DataFrame:
    """MLlib KMeans (k-means|| init) — the production-scale path.

    ``with_sqdist=True`` adds the squared distance to the assigned
    centroid (the WCSS contribution), computed against the fitted
    model's centroids as a broadcast k×d literal table — this is what
    lets the no-oracle MLlib path be semantically checked against the
    oracled relational twin's converged WCSS."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    arr = to_double(vec_col)
    feats = df.select(
        F.col(key_col).alias("id"),
        array_to_vector(arr).alias("features"),
        arr.alias("vec"),
    )
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feats)
    out = model.transform(feats).select(
        "id", "vec", F.col("prediction").cast("long").alias("cluster")
    )
    if not with_sqdist:
        return out.select("id", "cluster")
    cents = df.sparkSession.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster long, centroid array<double>",
    )
    return out.join(F.broadcast(cents), "cluster").select(
        "id", "cluster", _sq_dist("vec", "centroid").alias(_SQDIST)
    )


def silhouette_cosine(
    df: DataFrame,
    key_col: str = "vec_id",
    cluster_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette with cosine distance.

    Completes C5 next to CH/DBI (ref Simulation_Auxiliary/
    test_metrics.py:15-17 silhouette_score(metric='cosine')). The
    simplified variant scores each point against cluster CENTROIDS
    instead of all points: a_i = cosdist(x_i, own centroid), b_i =
    min over other centroids — O(N·k) via one broadcast join, no N²
    pairwise pass, so it survives 100-TB inputs (this is also what
    MLlib's ClusteringEvaluator computes, for the same reason).
    s_i = (b_i - a_i) / max(a_i, b_i); result = mean s_i.
    """
    pts = df.select(
        F.col(key_col).alias("id"),
        F.col(cluster_col).alias("c"),
        to_double(vec_col).alias("vec"),
    )
    long = pts.select("c", F.posexplode("vec").alias("dim", "x"))
    cent = long.groupBy("c", "dim").agg(
        (fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("m")
    )
    cent_arr = (
        cent.groupBy("c")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_dm"))
        .select(F.col("c").alias("cj"), F.transform("_dm", lambda s: s["m"]).alias("centroid"))
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    def _norm(a):
        return F.sqrt(_dot(a, a))

    scored = pts.crossJoin(F.broadcast(cent_arr)).select(
        "id", "c", "cj",
        (
            F.lit(1.0)
            - _dot("vec", "centroid")
            / F.greatest(_norm("vec") * _norm("centroid"), F.lit(1e-12))
        ).alias("d"),
    )
    ab = scored.groupBy("id", "c").agg(
        F.min(F.when(F.col("cj") == F.col("c"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("cj") != F.col("c"), F.col("d"))).alias("b"),
    )
    s = ab.select(
        ((F.col("b") - F.col("a")) / F.greatest("a", "b", F.lit(1e-12))).alias("s")
    )
    return s.agg(
        (fpsum("s", Q30) / F.count(F.lit(1)).cast("double")).alias("silhouette")
    )


def silhouette_cosine_exact(
    df: DataFrame,
    key_col: str = "vec_id",
    cluster_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT mean silhouette with cosine distance — sklearn
    ``silhouette_score(metric='cosine')`` semantics (ref
    Simulation_Auxiliary/test_metrics.py:15-17) without the all-pairs
    pass.

    Identity: with v̂ = v/‖v‖ and S_C = Σ_{u∈C} û (per-cluster sums of
    normalized vectors), the mean cosine distance from point i to
    cluster C is (|C| − ⟨v̂ᵢ, S_C⟩)/|C|; for i's own cluster, subtract
    the zero self-distance: aᵢ = ((n−1) − (⟨v̂ᵢ, S_c⟩ − ⟨v̂ᵢ, v̂ᵢ⟩))/(n−1).
    bᵢ = min over other clusters of the first form, sᵢ = (b−a)/max(a,b)
    (0 for singleton clusters, matching sklearn's nan_to_num).

    Cost: one explode+groupBy for the k cluster-sum vectors + one
    broadcast join — O(N·k·d), no N² pairwise work, so unlike the
    textbook formulation this survives 100-TB inputs. Cluster sums are
    fixed-point (Q40: |x̂| ≤ 1, so safe to ~9e6 rows per cluster per
    dim; beyond that drop to Q30) making the whole query
    DuckDB-replayable bit-for-bit.
    """
    from ae_data_integration_spark.functions.arrays import dot, l2_norm

    # Norm as a COLUMN, not l2_normalize's per-element lambda: a HOF
    # lambda body re-evaluates its outer subexpressions per element
    # (interpreted, no CSE), turning x/‖v‖ into an O(d²) fold per row.
    # Normalizing after the explode keeps it O(d) (Generate blocks
    # projection collapse, so nrm is computed once per input row), and
    # the scoring join uses linearity: ⟨v̂,S⟩ = ⟨v,S⟩/nrm — the oracle
    # replays the identical forms.
    pts = df.select(
        F.col(key_col).alias("id"),
        F.col(cluster_col).alias("c"),
        to_double(vec_col).alias("v"),
    ).withColumn("nrm", F.greatest(l2_norm("v"), F.lit(1e-12)))
    long = pts.select("c", "nrm", F.posexplode("v").alias("dim", "x0")).select(
        "c", "dim", (F.col("x0") / F.col("nrm")).alias("x")
    )
    cs = long.groupBy("c", "dim").agg(
        fpsum("x", Q40).alias("s"), F.count(F.lit(1)).alias("n_c")
    )
    cent = (
        cs.groupBy("c")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("_ds"),
            F.max("n_c").alias("n"),
        )
        .select(
            F.col("c").alias("cj"),
            F.transform("_ds", lambda t: t["s"]).alias("sarr"),
            "n",
        )
    )
    pd_ = pts.crossJoin(F.broadcast(cent)).select(
        "id", "c", "cj", "n",
        (dot("v", "sarr") / F.col("nrm")).alias("dt"),
        (dot("v", "v") / F.col("nrm") / F.col("nrm")).alias("selfd"),
    )
    nm1 = (F.col("n") - F.lit(1)).cast("double")
    ab = pd_.groupBy("id", "c").agg(
        F.min(
            F.when(
                F.col("cj") == F.col("c"),
                F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
                    (nm1 - (F.col("dt") - F.col("selfd"))) / nm1
                ),
            )
        ).alias("a"),
        F.min(
            F.when(
                F.col("cj") != F.col("c"),
                (F.col("n").cast("double") - F.col("dt")) / F.col("n").cast("double"),
            )
        ).alias("b"),
        F.max(F.when(F.col("cj") == F.col("c"), F.col("n"))).alias("nown"),
    )
    s = ab.select(
        F.when(F.col("nown") == 1, F.lit(0.0))
        .otherwise(
            (F.col("b") - F.col("a")) / F.greatest("a", "b", F.lit(1e-12))
        )
        .alias("s")
    )
    return s.agg(
        (fpsum("s", Q30) / F.count(F.lit(1)).cast("double")).alias("silhouette")
    )


def ch_dbi(
    df: DataFrame, cluster_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Calinski-Harabasz + Davies-Bouldin for a given hard clustering.

    All statistics from two explode+groupBy passes (cluster centroids,
    global centroid) with fixed-point means — no pairwise point work;
    only k² centroid pairs touch the driver-scale tail.
    """
    pts = df.select(F.col(cluster_col).alias("c"), to_double(vec_col).alias("vec"))
    long = pts.select("c", F.posexplode("vec").alias("dim", "x"))

    cent = long.groupBy("c", "dim").agg(
        (fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("m")
    )
    cent_arr = (
        cent.groupBy("c")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_dm"))
        .select("c", F.transform("_dm", lambda s: s["m"]).alias("centroid"))
    )
    glob = long.groupBy("dim").agg(
        (fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("g")
    )
    glob_arr = glob.agg(
        F.array_sort(F.collect_list(F.struct("dim", "g"))).alias("_dg")
    ).select(F.transform("_dg", lambda s: s["g"]).alias("gcent"))

    sizes = pts.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))
    tot = pts.agg(F.count(F.lit(1)).alias("n"))

    # W: within-cluster sum of squared distances; s_i: mean distance.
    wdf = (
        pts.join(F.broadcast(cent_arr), "c")
        .select("c", _sq_dist("vec", "centroid").alias("d2"))
        .groupBy("c")
        .agg(
            fpsum("d2", Q30).alias("w_c"),
            (fpsum(F.sqrt(F.col("d2")), Q30) / F.count(F.lit(1)).cast("double")).alias("s_c"),
        )
    )
    # B: between-cluster dispersion.
    bdf = (
        cent_arr.crossJoin(F.broadcast(glob_arr))
        .select("c", _sq_dist("centroid", "gcent").alias("bd2"))
        .join(F.broadcast(sizes), "c")
        .agg(fpsum(F.col("n_c") * F.col("bd2"), Q30).alias("B"))
    )
    w_tot = wdf.agg(fpsum("w_c", Q30).alias("W"), F.count(F.lit(1)).alias("k"))

    # DBI: max over j≠i of (s_i+s_j)/||μ_i-μ_j|| per i, then mean.
    a = cent_arr.select(F.col("c").alias("ci"), F.col("centroid").alias("mi"))
    b = cent_arr.select(F.col("c").alias("cj"), F.col("centroid").alias("mj"))
    si = wdf.select(F.col("c").alias("ci"), F.col("s_c").alias("si"))
    sj = wdf.select(F.col("c").alias("cj"), F.col("s_c").alias("sj"))
    pair = (
        a.crossJoin(b)
        .filter(F.col("ci") != F.col("cj"))
        .join(F.broadcast(si), "ci")
        .join(F.broadcast(sj), "cj")
        .select(
            "ci",
            ((F.col("si") + F.col("sj")) / F.sqrt(_sq_dist("mi", "mj"))).alias("r"),
        )
        .groupBy("ci")
        .agg(F.max("r").alias("rmax"))
        .agg((fpsum("rmax", Q30) / F.count(F.lit(1)).cast("double")).alias("dbi"))
    )

    return (
        bdf.crossJoin(w_tot)
        .crossJoin(F.broadcast(tot))
        .crossJoin(pair)
        .select(
            (
                (F.col("B") / (F.col("k") - F.lit(1.0)))
                / (F.col("W") / (F.col("n") - F.col("k")).cast("double"))
            ).alias("ch"),
            "dbi",
        )
    )
