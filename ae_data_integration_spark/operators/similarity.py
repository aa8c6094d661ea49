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

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import (
    _unrolled_fold,
    dot,
    dot_unrolled,
    l2_norm,
    to_double,
)


_DIM_CACHE: dict[tuple, int | None] = {}


def _vec_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector width probed at plan time (None on empty input). Lets
    every distance/cosine expression use the unrolled codegen form —
    interpreted HOF folds in join residuals were measured at ~1 µs per
    element, which turns a bucketed candidate join into the job
    bottleneck at 10x scale.

    The probe is one first() job; for file-backed inputs the result is
    cached by the scan's file set (inputFiles() is a driver-side
    metadata listing, no job), so repeated plan builds — bench reps,
    parity reruns — pay it once per dataset per process. The cache key
    includes each local file's (size, mtime): a dataset regenerated
    in place under the same paths (e.g. .benchdata/sf1 rebuilt) must
    not serve a stale width — a wrong d would make dot_unrolled read
    element_at past the array end, silently NULLing cosines."""
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:  # noqa: BLE001 - e.g. streaming/planless inputs
        files = ()

    def _fingerprint(uri: str):
        path = uri[7:] if uri.startswith("file://") else uri
        try:
            st = os.stat(path)
            return (uri, st.st_size, st.st_mtime_ns)
        except OSError:  # non-local scheme — path identity only
            return (uri,)

    key = (tuple(_fingerprint(f) for f in files), vec_col)
    if files and key in _DIM_CACHE:
        return _DIM_CACHE[key]
    head = df.select(vec_col).first()
    dim = None if head is None or head[0] is None else len(head[0])
    if files:
        _DIM_CACHE[key] = dim
    return dim


def _dot(a, b, d: int | None):
    return dot_unrolled(a, b, d) if d is not None else dot(a, b)


def _cos_with_norms(a, b, nrm_a, nrm_b, d: int | None):
    """Cosine from a codegen'd dot product and PRE-MATERIALIZED row
    norms. The norms are computed once per row (O(N·d)), not once per
    candidate pair (O(pairs·d)) — and the join-side expression tree
    shrinks from 3d to d terms, which also cuts Catalyst
    analysis/codegen time on wide vectors. Bit-identical to the
    inline form: sqrt-per-row then multiply is the exact same op
    sequence the SQL oracle evaluates."""
    return _dot(a, b, d) / F.greatest(
        (F.col(nrm_a) if isinstance(nrm_a, str) else nrm_a)
        * (F.col(nrm_b) if isinstance(nrm_b, str) else nrm_b),
        F.lit(1e-12),
    )


def _widen(df: DataFrame) -> DataFrame:
    """Spread a compute-dense side across the cluster. Columnar
    vector data compresses ~50x, so a scan split sized for IO (128 MB)
    carries hours of per-pair arithmetic — one round-robin shuffle of
    the raw rows buys full parallelism for the join/window that
    follows."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


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
    d = _vec_dim(emb, vec_col)
    q = queries.select(
        F.col(key_col).alias("q_id"),
        to_double(vec_col).alias("q_vec"),
    ).withColumn("q_nrm", l2_norm("q_vec"))
    c = _widen(
        emb.select(F.col(key_col).alias("n_id"), to_double(vec_col).alias("n_vec"))
    ).withColumn("n_nrm", l2_norm("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", _cos_with_norms("q_vec", "n_vec", "q_nrm", "n_nrm", d))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", F.col("rk").cast("long").alias("rk"))
    )


def hard_negative_topk(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "lang",
    k: int = 10,
) -> DataFrame:
    """Exact top-k HARD NEGATIVES per query: nearest-by-cosine corpus
    vectors whose label differs from the query's — the contrastive-
    pair mining step of a training-data pipeline (same-meaning-
    different-class lookalikes make the hardest negatives).

    Same plan shape as brute_force_topk: the labeled probe set is
    broadcast, the labeled corpus scanned once with the label
    inequality fused into the join predicate (Catalyst evaluates it
    alongside n_id != q_id — no post-filter pass), then the per-query
    top-k window (probe-count partitions, bounded)."""
    d = _vec_dim(emb, vec_col)
    q = queries.select(
        F.col(key_col).alias("q_id"),
        to_double(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_lab"),
    ).withColumn("q_nrm", l2_norm("q_vec"))
    c = _widen(
        emb.select(
            F.col(key_col).alias("n_id"),
            to_double(vec_col).alias("n_vec"),
            F.col(label_col).alias("n_lab"),
        )
    ).withColumn("n_nrm", l2_norm("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("n_id") != F.col("q_id"))
            & (F.col("n_lab") != F.col("q_lab"))
        )
        .withColumn("cos", _cos_with_norms("q_vec", "n_vec", "q_nrm", "n_nrm", d))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id", "n_id", F.col("n_lab").alias("n_lang"), "cos",
            F.col("rk").cast("long").alias("rk"),
        )
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
    # Deliberately the compact HOF fold, NOT an unrolled expression:
    # the signature is O(N) row work (bits x dim interpreted ops per
    # ROW, never per pair) — negligible next to the pair-level joins —
    # while an unrolled bits*dim-term tree costs Catalyst/codegen
    # seconds of PLAN time per query. Unrolling pays only in per-PAIR
    # expressions (see _cos_with_norms).
    #
    # Built as ONE SQL-text expr: the former per-literal Column form
    # issued bits*dim F.lit py4j calls (~3.0 s of plan construction at
    # 8x64, measured); the parser builds the IDENTICAL tree — same HOF
    # lambdas, same fold order, repr() round-trips each plane double
    # exactly — in ~2 ms. String-ref inputs only (every call site
    # passes a column name); Column inputs fall back below.
    if isinstance(vec_col, str):
        def proj_sql(j: int) -> str:
            lits = ", ".join(
                f"{_plane_component(j, d, salt)!r}D" for d in range(dim)
            )
            return (
                f"aggregate(zip_with({vec_col}, array({lits}), "
                "(x, p) -> x * p), 0.0D, (acc, x) -> acc + x)"
            )

        return F.expr(
            "CAST(0 AS BIGINT)" + "".join(
                f" + CASE WHEN {proj_sql(j)} > 0 THEN CAST({1 << j} AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
                for j in range(bits)
            )
        )

    vec = vec_col

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
    d = _vec_dim(emb, vec_col)
    sig = _widen(
        emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("vec"))
    ).select(
        "id", "vec",
        l2_norm("vec").alias("nrm"),
        hyperplane_signature("vec", bits, dim=d or 64).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _cos_with_norms("a.vec", "b.vec", "a.nrm", "b.nrm", d).alias("cos"),
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
    d = _vec_dim(emb, vec_col)

    q = queries.select(
        F.col(key_col).alias("q_id"), to_double(vec_col).alias("q_vec")
    )
    # Q x k_clusters rows only — the compact HOF fold keeps the plan
    # tree small; unrolling is reserved for per-candidate expressions.
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
        .select("q_id", F.col("q_vec"), "cluster")
        .withColumn("q_nrm", l2_norm("q_vec"))
    )
    # probes is Q*nprobe rows — BROADCAST it against the (widened)
    # data side: zero shuffle of the corpus, and parallelism is the
    # corpus partition count instead of k_clusters join partitions
    # (with a small fixed k the cluster-key shuffle caps the job at k
    # tasks — the 10x-scale leg exposed exactly that).
    cand = (
        _widen(data)
        .withColumn("n_nrm", l2_norm("vec"))
        .join(F.broadcast(probes), "cluster")
        .filter(F.col("id") != F.col("q_id"))
    )
    scored = cand.withColumn("cos", _cos_with_norms("q_vec", "vec", "q_nrm", "n_nrm", d))
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos"), "id")
    return (
        scored.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= topk)
        .select("q_id", F.col("id").alias("n_id"), "cos", F.col("rk").cast("long").alias("rk"))
    )


def _sqdist_unrolled(a, b, n: int):
    """Statically unrolled Σ(a[i]-b[i])² — same sequential fold order
    as list_reduce, compiled by whole-stage codegen (the per-candidate
    expression rule, see _cos_with_norms). String refs build the tree
    as ONE SQL-text expr (same parser-built tree, ~100x cheaper plan
    construction than per-term py4j Column ops — see dot_unrolled)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            "0.0D" + "".join(
                f" + (element_at({a}, {i}) - element_at({b}, {i}))"
                f"*(element_at({a}, {i}) - element_at({b}, {i}))"
                for i in range(1, n + 1)
            )
        )
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    out = F.lit(0.0)
    for i in range(1, n + 1):
        t = F.element_at(a, i) - F.element_at(b, i)
        out = out + t * t
    return out


def _pq_sub_scored(pts: DataFrame, cb: DataFrame, m: int, ds: int) -> DataFrame:
    """(id, ss, sv, cluster, sqd) — every (vector, subspace) row
    scored against its subspace's codebook rows (broadcast join; the
    codebook is model-sized). Shared by the Lloyd pass and the
    encode; argmin is taken by the caller with a map-side-combined
    aggregate, NOT a rank window — min(struct(sqd, cluster)) is the
    same (distance, cluster) tie-break the window's orderBy applied,
    without the N·m·k-row exchange + sort (guide §2.3-2.4: aggregate
    before you shuffle; the partial agg ships one row per (id, ss)
    instead of k)."""
    sub = pts.select(
        "id",
        F.posexplode(
            F.array(*[F.slice("v", ss * ds + 1, ds) for ss in range(m)])
        ).alias("ss", "sv"),
    )
    return sub.join(F.broadcast(cb), "ss").withColumn(
        "sqd", _sqdist_unrolled("sv", "centroid", ds)
    )


def _pq_train_encode(
    pts: DataFrame, m: int, k: int, ds: int, salt: str
) -> tuple[DataFrame, DataFrame]:
    """Train m per-subspace PQ codebooks over `pts` = (id,
    v array<double>) and encode every vector.

    Init = the k vectors with smallest md5(salt‖id), sliced per
    subspace; one grouped Lloyd pass (all m codebooks update in the
    same two jobs — assignment keyed by (id, ss), fixed-point means).
    Returns (codebook, codes): codebook is a model-sized LITERAL
    DataFrame (ss, cluster, centroid) — k*Σds doubles round-tripped
    through the driver exactly, same as kmeans_fit's per-iteration
    collect — and codes is (id, codes array<long>) in subspace order.
    Shared by pq_adc_rerank (codebooks over raw vectors) and
    ivfpq_adc_rerank (codebooks over coarse-cell residuals).
    """
    from ae_data_integration_spark.functions.hashing import md5_rank
    from ae_data_integration_spark.functions.portable import Q30, fpsum

    spark = pts.sparkSession
    seed_rows = (
        pts.withColumn("_h", md5_rank(F.col("id"), salt))
        .orderBy("_h", "id")
        .limit(k)
        .select("v")
        .collect()
    )
    cb0 = spark.createDataFrame(
        [
            (ss, j, list(r["v"][ss * ds:(ss + 1) * ds]))
            for ss in range(m)
            for j, r in enumerate(seed_rows)
        ],
        "ss int, cluster long, centroid array<double>",
    )

    # Seed-codebook assignment: min_by argmin (ObjectHashAggregate —
    # map-side combined, no rank window / sort; see _pq_sub_scored).
    # The ordering struct (sqd, cluster) is unique within a group, so
    # min_by is deterministic and equals the former window's
    # orderBy(sqd, cluster) first-row.
    assigned0 = (
        _pq_sub_scored(pts, cb0, m, ds)
        .groupBy("id", "ss")
        .agg(F.min_by(F.struct("sv", "cluster"), F.struct("sqd", "cluster")).alias("_b"))
        .select("id", "ss", F.col("_b.sv").alias("sv"), F.col("_b.cluster").alias("cluster"))
    )

    upd = (
        assigned0
        .select("ss", "cluster", F.posexplode("sv").alias("dim", "x"))
        .groupBy("ss", "cluster", "dim")
        .agg((fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("mn"))
        .groupBy("ss", "cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mn"))).alias("_dm"))
        .select("ss", "cluster", F.transform("_dm", lambda s: s["mn"]).alias("centroid"))
    )
    cb1 = spark.createDataFrame(
        upd.collect(), "ss int, cluster long, centroid array<double>"
    )  # model-sized

    return cb1, _pq_encode(pts, cb1, m, ds)


def _pq_encode(pts: DataFrame, cb1: DataFrame, m: int, ds: int) -> DataFrame:
    """Encode (id, v) rows under FROZEN codebooks — (id, codes
    array<long>) in subspace order. This is the faiss ``add()`` path:
    new vectors join an existing index with work ∝ batch (one
    broadcast of the model-sized codebook, one per-(id, subspace)
    nearest-centroid window), no retraining and no touch of the codes
    already stored. Shared by _pq_train_encode (the build) and
    ann_index.append_to_pq_index (the increment).

    Argmin per subspace is a PIVOTED min(when(ss=…)) aggregate —
    ONE map-side-combined exchange keyed by id replaces the former
    per-(id, ss) rank window (exchange of N·m·k rows + sort) AND the
    second groupBy(id) collect_list exchange. min over struct(sqd,
    cluster) is the same lexicographic (distance, cluster) tie-break;
    the array is assembled in subspace order exactly as the former
    array_sort(collect_list(struct(ss, cluster))) did."""
    j = _pq_sub_scored(pts, cb1, m, ds)
    mins = j.groupBy("id").agg(
        *[
            F.min(F.when(F.col("ss") == ss, F.struct("sqd", "cluster"))).alias(f"_m{ss}")
            for ss in range(m)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"_m{ss}.cluster") for ss in range(m)]).alias("codes")
    )


def _pq_serve(
    pts: DataFrame,
    cb1: DataFrame,
    codes: DataFrame,
    q_ids: DataFrame,
    *,
    m: int,
    k: int,
    ds: int,
    d: int,
    refine: int,
    topk: int,
) -> DataFrame:
    """Query-time half of PQ-ADC search, given a TRAINED index:
    `cb1` = (ss, cluster, centroid) codebooks (model-sized, broadcast),
    `codes` = (id, codes array<long>) — whether just trained in this
    plan (pq_adc_rerank) or scanned back from a persisted artifact
    (operators/ann_index.pq_serve_topk, the production shape where the
    index is built once per corpus and served per query).

    Builds the per-query m*k ADC lookup tables, scans `codes` with m
    integer lookups per (query, doc), integer top-`refine`, then
    exact-cosine reranks against `pts` = (id, v original vector).
    Bit-deterministic given the index: Q30 integer LUT entries and
    (score, id) tie-breaks, so serve-from-artifact equals
    train-and-serve exactly (parquet round-trips doubles/longs
    bit-for-bit) — one oracle covers both registrations.
    """
    from ae_data_integration_spark.functions.portable import Q30

    # --- per-query ADC lookup tables: Q*m*k quantized partial dots
    q_sub = (
        pts.join(F.broadcast(q_ids), pts["id"] == q_ids["q_id"])
        .select(
            "q_id",
            F.posexplode(
                F.array(*[F.slice("v", ss * ds + 1, ds) for ss in range(m)])
            ).alias("ss", "qsv"),
        )
    )
    lut_r = q_sub.join(F.broadcast(cb1), "ss").select(
        "q_id", "ss", "cluster",
        F.round(
            dot_unrolled("qsv", "centroid", ds) * F.lit(float(Q30))
        ).cast("long").alias("p"),
    )
    # densify over the full (ss, cluster) spine: a cluster left empty
    # by the Lloyd pass is absent from cb1, and a gapped array would
    # silently break the ss*k+code index arithmetic. Padding value 0
    # is never read (codes only reference surviving clusters). The
    # spine is realized as a sequence/map projection in the SAME agg
    # that gathers the entries — the former spine crossJoin + left
    # join pair added two join stages per query for the same array.
    lut = (
        lut_r.groupBy("q_id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("ss") * k + F.col("cluster")).cast("int").alias("k"),
                        F.col("p").alias("v"),
                    )
                )
            ).alias("_mp")
        )
        .select(
            "q_id",
            F.expr(
                f"transform(sequence(0, {m * k - 1}), "
                "i -> coalesce(element_at(_mp, i), CAST(0 AS BIGINT)))"
            ).alias("lut"),
        )
    )

    # --- ADC scan: m integer lookups per (doc, query), no float math
    # one SQL-text expr instead of ~6m py4j Column ops (see dot_unrolled)
    score = F.expr(
        "CAST(0 AS BIGINT)" + "".join(
            f" + element_at(lut, CAST({ss * k}"
            f" + CAST(element_at(codes, {ss + 1}) AS INT) + 1 AS INT))"
            for ss in range(m)
        )
    )
    appr = (
        codes.crossJoin(F.broadcast(lut))
        .filter(F.col("id") != F.col("q_id"))
        .withColumn("s", score)
    )
    wa = Window.partitionBy("q_id").orderBy(F.desc("s"), "id")
    cand = (
        appr.withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") <= refine)
        .select("q_id", F.col("id").alias("n_id"))
    )

    # --- exact rerank on original vectors: Q*refine rows only
    qv = pts.select(F.col("id").alias("q_id"), F.col("v").alias("q_vec")).join(
        F.broadcast(q_ids), "q_id"
    )
    rer = (
        cand.join(F.broadcast(qv), "q_id")
        .join(pts.select(F.col("id").alias("n_id"), F.col("v").alias("n_vec")), "n_id")
        .withColumn("q_nrm", l2_norm("q_vec"))
        .withColumn("n_nrm", l2_norm("n_vec"))
        .withColumn("cos", _cos_with_norms("q_vec", "n_vec", "q_nrm", "n_nrm", d))
    )
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        rer.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= topk)
        .select("q_id", "n_id", "cos", F.col("rk").cast("long").alias("rk"))
    )


def pq_adc_rerank(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    refine: int = 30,
    topk: int = 10,
    salt: str = "pq",
) -> DataFrame:
    """Product-quantization ANN with ADC (asymmetric distance
    computation) — the missing step between SQ8 and IVF for 100-TB
    vector search (Jégou et al. 2011, faiss IndexPQ):

    * the vector is split into `m` subspaces of d/m dims; each
      subspace gets its OWN k-centroid codebook (md5-seeded init +
      one fixed-point Lloyd pass — the kmeans_fit discipline, grouped
      by subspace so all m codebooks train in the same two jobs);
    * the corpus is encoded as m small ints per vector (PQ codes:
      m bytes at k<=256 — a 32x storage/scan reduction on d=64
      float64 vectors);
    * per query, an m*k lookup table of quantized partial dots is
      built once (ADC), and scanning the corpus is m array lookups +
      integer adds per (query, doc) — NO float math against corpus
      vectors, exactly the production memory-bandwidth shape;
    * the integer-argmax top-`refine` candidates are reranked with
      exact cosine on original vectors (Q*refine rows read back).

    Deterministic end to end (md5 seeds, fixed-point centroid means,
    Q30 integer LUT entries, (score, id) tie-breaks), so the DuckDB
    oracle replays codebook training, encoding, ADC, and rerank
    bit-for-bit. Scale shape: codebooks/LUTs are model-sized
    broadcasts (m*k*(d/m) = k*d doubles); the corpus is scanned, never
    shuffled; the only shuffles are the k*d-row centroid update and
    the per-query top-k windows.
    """
    from ae_data_integration_spark.functions.caching import persist_tracked

    d = _vec_dim(emb, vec_col)
    if d is None or d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    ds = d // m

    pts = persist_tracked(
        _widen(emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("v")))
    )

    cb1, codes = _pq_train_encode(pts, m=m, k=k, ds=ds, salt=salt)
    q_ids = queries.select(F.col(key_col).alias("q_id"))
    return _pq_serve(
        pts, cb1, codes, q_ids, m=m, k=k, ds=ds, d=d, refine=refine, topk=topk
    )


def _ivfpq_serve(
    pts: DataFrame,
    cents: DataFrame,
    cb1: DataFrame,
    coded: DataFrame,
    q_ids: DataFrame,
    *,
    m: int,
    k: int,
    ds: int,
    d: int,
    nprobe: int,
    refine: int,
    topk: int,
) -> DataFrame:
    """Query-time half of IVF-PQ search, given a TRAINED index:
    `cents` = (cell, centroid) coarse quantizer, `cb1` = (ss, cluster,
    centroid) residual codebooks, `coded` = (id, cell, codes) — just
    trained (ivfpq_adc_rerank) or scanned from a persisted artifact
    (operators/ann_index.ivfpq_serve_topk). `pts` = (id, vec) original
    vectors for the probe distances and the exact-cosine rerank.

    Probes the `nprobe` nearest cells per query, builds per-(query,
    cell) negated-L2 ADC tables from the QUERY residual, scores only
    docs in probed cells (m integer lookups each), integer
    top-`refine`, exact rerank. Bit-deterministic given the index —
    serve-from-artifact equals train-and-serve exactly.
    """
    from ae_data_integration_spark.functions.portable import Q30

    # --- probes: nprobe nearest cells per query (Q x k_coarse rows)
    q = pts.select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec")).join(
        F.broadcast(q_ids), "q_id"
    )
    qd = q.crossJoin(F.broadcast(cents)).withColumn(
        "cdist",
        F.aggregate(
            F.zip_with("q_vec", "centroid", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a_, v_: a_ + v_,
        ),
    )
    wq = Window.partitionBy("q_id").orderBy("cdist", "cell")
    probes = (
        qd.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select(
            "q_id", "cell",
            F.zip_with("q_vec", "centroid", lambda a, b: a - b).alias("q_res"),
        )
    )

    # --- per-(query, cell) ADC LUTs over the query RESIDUAL.
    # LUT entry = round(-||q_res_ss - centroid||^2 * Q30): the faiss
    # IndexIVFPQ ADC form — summing per-subspace squared distances
    # gives the exact L2 distance to the reconstruction, so the
    # integer argmax ranks candidates by distance-to-reconstruction.
    q_sub = probes.select(
        "q_id", "cell",
        F.posexplode(
            F.array(*[F.slice("q_res", ss * ds + 1, ds) for ss in range(m)])
        ).alias("ss", "qsv"),
    )
    lut_r = q_sub.join(F.broadcast(cb1), "ss").select(
        "q_id", "cell", "ss", "cluster",
        F.round(
            -_sqdist_unrolled("qsv", "centroid", ds) * F.lit(float(Q30))
        ).cast("long").alias("p"),
    )
    # same spine-free densify as _pq_serve (see the comment there)
    lut = (
        lut_r.groupBy("q_id", "cell")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("ss") * k + F.col("cluster")).cast("int").alias("k"),
                        F.col("p").alias("v"),
                    )
                )
            ).alias("_mp")
        )
        .select(
            "q_id", "cell",
            F.expr(
                f"transform(sequence(0, {m * k - 1}), "
                "i -> coalesce(element_at(_mp, i), CAST(0 AS BIGINT)))"
            ).alias("lut"),
        )
    )

    # --- ADC over probed cells only
    # one SQL-text expr instead of ~6m py4j Column ops (see dot_unrolled)
    score = F.expr(
        "CAST(0 AS BIGINT)" + "".join(
            f" + element_at(lut, CAST({ss * k}"
            f" + CAST(element_at(codes, {ss + 1}) AS INT) + 1 AS INT))"
            for ss in range(m)
        )
    )
    appr = (
        coded.join(F.broadcast(lut), "cell")
        .filter(F.col("id") != F.col("q_id"))
        .withColumn("s", score)
    )
    wa = Window.partitionBy("q_id").orderBy(F.desc("s"), "id")
    cand = (
        appr.withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") <= refine)
        .select("q_id", F.col("id").alias("n_id"))
    )

    # --- exact rerank on ORIGINAL vectors
    qv = pts.select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec")).join(
        F.broadcast(q_ids), "q_id"
    )
    rer = (
        cand.join(F.broadcast(qv), "q_id")
        .join(pts.select(F.col("id").alias("n_id"), F.col("vec").alias("n_vec")), "n_id")
        .withColumn("q_nrm", l2_norm("q_vec"))
        .withColumn("n_nrm", l2_norm("n_vec"))
        .withColumn("cos", _cos_with_norms("q_vec", "n_vec", "q_nrm", "n_nrm", d))
    )
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        rer.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= topk)
        .select("q_id", "n_id", "cos", F.col("rk").cast("long").alias("rk"))
    )


def ivfpq_adc_rerank(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k_coarse: int = 8,
    nprobe: int = 2,
    m: int = 8,
    k: int = 32,
    refine: int = 60,
    topk: int = 10,
    salt: str = "ivfpq",
) -> DataFrame:
    """IVF-PQ ANN — the full faiss IndexIVFPQ shape, completing the
    vector-search ladder (brute → LSH → IVF → SQ8 → PQ → IVF-PQ):

    * a coarse md5-seeded quantizer (kmeans_fit, one Lloyd pass)
      partitions the corpus into `k_coarse` cells;
    * each vector is PQ-encoded on its RESIDUAL (vec − cell centroid)
      — residuals concentrate near 0, so the shared m-subspace
      codebooks spend their resolution where the data is (the reason
      faiss encodes residuals, Jégou et al. 2011 §III-C);
    * a query probes its `nprobe` nearest cells; per probed cell the
      QUERY residual builds an m*k ADC lookup table, and only docs in
      probed cells are scored — m integer lookups each;
    * integer top-`refine` → exact-cosine rerank on original vectors.

    At 100 TB: the scanned index is (cell id + m code bytes) per
    vector, candidates drop by ~nprobe/k_coarse, and every model
    artifact (coarse centroids, PQ codebooks, per-(query, cell) LUTs)
    is a broadcast. Deterministic end to end — the DuckDB oracle
    replays the coarse quantizer, residuals, codebook training,
    encoding, probing, ADC, and rerank bit-for-bit.
    """
    from ae_data_integration_spark.functions.caching import persist_tracked
    from ae_data_integration_spark.operators.kmeans import kmeans_fit

    d = _vec_dim(emb, vec_col)
    if d is None or d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    ds = d // m

    # --- coarse quantizer + residual encoding
    assigned, cents = kmeans_fit(
        emb, key_col, vec_col, k=k_coarse, n_iter=1, salt=salt
    )
    res = persist_tracked(
        _widen(assigned.select("id", "vec", F.col("cluster").alias("cell")))
        .join(F.broadcast(cents.withColumnRenamed("cluster", "cell")), "cell")
        .select(
            "id", "cell", "vec",
            F.zip_with("vec", "centroid", lambda a, b: a - b).alias("v"),
        )
    )
    cb1, codes = _pq_train_encode(
        res.select("id", "v"), m=m, k=k, ds=ds, salt=salt + "c"
    )
    coded = codes.join(res.select("id", "cell"), "id")

    q_ids = queries.select(F.col(key_col).alias("q_id"))
    return _ivfpq_serve(
        res.select("id", "vec"),
        cents.withColumnRenamed("cluster", "cell"),
        cb1,
        coded,
        q_ids,
        m=m, k=k, ds=ds, d=d, nprobe=nprobe, refine=refine, topk=topk,
    )


def sq8_rerank_topk(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    refine: int = 30,
) -> DataFrame:
    """SQ8 ANN: scalar-quantize every vector to 8-bit codes with a
    per-dimension (min, max) grid, scan the *quantized* corpus for an
    approximate top-`refine` per query, then exact-cosine rerank only
    those candidates to the final `topk`.

    This is the memory-bandwidth scale path real vector stores ship
    (faiss IndexScalarQuantizer): at 100 TB the stored/scanned column
    is the 1-byte-per-dim code array — 4-8x fewer bytes per vector
    than float32/64 — and the full-precision vectors are touched only
    for the Q x `refine` rerank rows. Here the codes stay an int
    array (Spark has no uint8 array), but the plan shape is the
    production shape: one map-combinable 64-cell stats agg, a
    per-ROW dequantize before the broadcast join (never per pair),
    zero corpus shuffle, and a rerank join that reads O(Q*refine)
    original rows.

    Everything is deterministic and engine-portable: min/max are
    exact, the quantize/dequantize arithmetic is the same IEEE op
    sequence in both engines, and the approximate score is an
    integer Q30 fixed-point sum (order-independent), so the DuckDB
    oracle replays the whole pipeline bit-for-bit.
    """
    from ae_data_integration_spark.functions.portable import Q30

    d = _vec_dim(emb, vec_col)
    e = emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("v"))

    # per-dim quantization grid: one narrow shuffle of N*d -> d cells,
    # map-side combined (min/max are algebraic).
    stats = (
        e.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    grid = (
        stats.select(
            "dim",
            "mn",
            F.greatest((F.col("mx") - F.col("mn")) / F.lit(255.0), F.lit(1e-12)).alias("st"),
        )
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mn", "st"))).alias("_g"))
        .select(
            F.transform("_g", lambda s: s["mn"]).alias("mins"),
            F.transform("_g", lambda s: s["st"]).alias("steps"),
        )
    )

    # quantize -> integer code (kept as a whole-number double: both
    # engines' round() is half-away-from-zero, so the code values are
    # bit-identical), then dequantize per ROW (not per pair).
    def _code(x, i):
        mn = F.element_at("mins", (i + F.lit(1)).cast("int"))
        st = F.element_at("steps", (i + F.lit(1)).cast("int"))
        return F.least(
            F.lit(255.0), F.greatest(F.lit(0.0), F.round((x - mn) / st))
        )

    def _deq(x, i):
        mn = F.element_at("mins", (i + F.lit(1)).cast("int"))
        st = F.element_at("steps", (i + F.lit(1)).cast("int"))
        return mn + _code(x, i) * st

    dq = e.crossJoin(F.broadcast(grid)).select(
        "id", F.transform("v", _deq).alias("dqv")
    )

    q_ids = queries.select(F.col(key_col).alias("q_id"))
    probes = dq.join(
        F.broadcast(q_ids), dq["id"] == q_ids["q_id"]
    ).select("q_id", F.col("dqv").alias("q_dq"))

    # approximate scan: integer Q30 dot over dequantized values —
    # order-independent, so any partitioning gives the same ranks.
    appr = (
        _widen(dq)
        .join(F.broadcast(probes), F.col("id") != F.col("q_id"))
        .withColumn(
            "s",
            F.aggregate(
                F.zip_with(
                    "q_dq", "dqv",
                    lambda a, b: F.round(a * b * F.lit(float(Q30))).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    wa = Window.partitionBy("q_id").orderBy(F.desc("s"), "id")
    cand = (
        appr.withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") <= refine)
        .select("q_id", F.col("id").alias("n_id"))
    )

    # exact rerank: only Q*refine original rows are read back.
    qv = e.select(F.col("id").alias("q_id"), F.col("v").alias("q_vec")).join(
        F.broadcast(q_ids), "q_id"
    )
    rer = (
        cand.join(F.broadcast(qv), "q_id")
        .join(e.select(F.col("id").alias("n_id"), F.col("v").alias("n_vec")), "n_id")
        .withColumn("q_nrm", l2_norm("q_vec"))
        .withColumn("n_nrm", l2_norm("n_vec"))
        .withColumn("cos", _cos_with_norms("q_vec", "n_vec", "q_nrm", "n_nrm", d))
    )
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        rer.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= topk)
        .select("q_id", "n_id", "cos", F.col("rk").cast("long").alias("rk"))
    )


def truncated_rerank_topk(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    trunc_dim: int = 16,
    shortlist: int = 50,
    k: int = 10,
) -> DataFrame:
    """Coarse-to-fine exact retrieval over prefix-truncated vectors
    (the Matryoshka/adaptive-retrieval serving pattern): stage 1
    scores the WHOLE corpus with cosine over only the first
    ``trunc_dim`` dimensions and keeps a ``shortlist`` per query;
    stage 2 reranks the shortlist with full-dimension exact cosine
    and returns the top ``k``.

    Why it scales: the corpus-sized scan does ``trunc_dim/d`` of the
    arithmetic (and, with a prefix-truncated stored copy, the IO) of
    brute force; the full-width vectors are only touched for
    Q·shortlist rows. Same broadcast-Q/scan-N shape as
    brute_force_topk — no shuffle until the per-query top-k window,
    and the stage-2 window input is shortlist-bounded.

    Exactness: both stages are plain slices + the usual sequential
    fold cosine, so a SQL oracle replays the whole cascade
    bit-for-bit (catalog s8). Final scores are EXACT cosines; only
    candidate selection is approximate (prefix truncation), which
    the s8 tests quantify as recall vs brute force.
    """
    d = _vec_dim(emb, vec_col)
    q = (
        queries.select(
            F.col(key_col).alias("q_id"), to_double(vec_col).alias("q_vec")
        )
        .withColumn("q_t", F.slice("q_vec", 1, trunc_dim))
        .withColumn("q_nrm", l2_norm("q_vec"))
        .withColumn("q_tnrm", l2_norm("q_t"))
    )
    c = (
        _widen(
            emb.select(
                F.col(key_col).alias("n_id"), to_double(vec_col).alias("n_vec")
            )
        )
        .withColumn("n_t", F.slice("n_vec", 1, trunc_dim))
        .withColumn("n_nrm", l2_norm("n_vec"))
        .withColumn("n_tnrm", l2_norm("n_t"))
    )
    coarse = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "cos_t", _cos_with_norms("q_t", "n_t", "q_tnrm", "n_tnrm", trunc_dim)
        )
    )
    w1 = Window.partitionBy("q_id").orderBy(F.desc("cos_t"), "n_id")
    short = coarse.withColumn("rk_t", F.row_number().over(w1)).filter(
        F.col("rk_t") <= shortlist
    )
    fine = short.withColumn(
        "cos", _cos_with_norms("q_vec", "n_vec", "q_nrm", "n_nrm", d)
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        fine.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", F.col("rk").cast("long").alias("rk"))
    )
