"""Deduplication operators for training-data pipelines.

Exact (fingerprint hash-groupBy), MinHash+LSH (shingle → minhash →
band → bucket self-join), SimHash, and n-gram Jaccard verification.
All JVM-side (md5 + array HOFs) — no Python UDFs, no driver loops —
and deterministic under any partitioning, so the DuckDB oracle can
reproduce every stage bit-for-bit.

Scale design (100 TB): the only shuffles are (a) the band-bucket
self-join, whose fan-out is controlled by the banding parameters
(a bucket with B members emits B² candidates — skewed mega-buckets
should be dropped via a count filter, see `lsh_candidate_pairs`
max_bucket), and (b) the final distinct on pairs. Signatures are
computed scan-side in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.hashing import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    char_array,
    lsh_bands,
    shingles,
    shingles_from_chars,
)
from ae_data_integration_spark.functions.text import fingerprint, tokens
from ae_data_integration_spark.functions.caching import persist_tracked


def exact_dup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact near-identical dedup: md5 over normalized text.

    Returns one row: total docs, distinct fingerprints, redundant docs.
    """
    fp = df.select(fingerprint(text_col).alias("fp"))
    return fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_redundant"),
    )


def doc_shingles(
    df: DataFrame, key_col: str, text_col: str, k: int = 5, spread: bool = False
) -> DataFrame:
    """Distinct k-shingle arrays per doc.

    spread=True rebalances a narrow scan (input splits < cores) by
    doc key before the substring pass — a bench-scale knob only: at
    corpus scale the scan already has >> cores splits and the extra
    shuffle of raw text would be pure waste, so it self-disables.
    """
    out = df.select(F.col(key_col).alias("doc"), F.col(text_col).alias("_t"))
    if spread:
        par = df.sparkSession.sparkContext.defaultParallelism
        if out.rdd.getNumPartitions() < par:
            out = out.repartition(par, "doc")
    # two-step char-array construction: O(len) per doc where the
    # direct substr form is O(len^2) — the zipf doc-length straggler
    # (SCALE_SPOT_r12 doc_skew_phase_isolation). The char array MUST
    # land in its own projection (HOF lambdas have no CSE).
    return out.select("doc", char_array("_t").alias("_ch")).select(
        "doc", shingles_from_chars("_ch", k).alias("shs")
    )


def lsh_band_table(
    shingle_df: DataFrame,
    num_perm: int = 8,
    num_bands: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc, band, bucket) LSH band table from a (doc, shs) shingle
    table — the shared front half of the self-join (intra-corpus) and
    cross-join (batch-vs-corpus) candidate generators.

    rows_per_band = num_perm / num_bands sets the similarity knee at
    roughly (1/num_bands)^(1/rows_per_band). `max_bucket` drops
    pathological buckets (skew guard for web-scale corpora).
    """
    rpb = num_perm // num_bands
    # Signature via explode + codegen'd min-aggregates rather than
    # array-HOF folds (HOF lambdas run interpreted — measured ~8x
    # slower). Distinct shingles give the same mins as raw ones.
    # Map-side partial mins shrink the shuffle to one row per
    # (doc, num_perm longs) — the layout that survives a 100 TB
    # corpus.
    ex = shingle_df.select("doc", F.explode("shs").alias("sh"))
    h = F.conv(F.substring(F.md5(F.col("sh")), 1, 12), 16, 10).cast("long")
    mins = ex.select("doc", h.alias("h")).groupBy("doc").agg(
        *[
            F.min(
                (F.lit(MINHASH_A[s]) * F.col("h") + F.lit(MINHASH_B[s]))
                % F.lit(MINHASH_P)
            ).alias(f"m{s}")
            for s in range(num_perm)
        ]
    )
    sig = mins.select(
        "doc", F.array(*[F.col(f"m{s}") for s in range(num_perm)]).alias("sig")
    )
    bands = sig.select(
        "doc", F.explode(lsh_bands("sig", num_bands, rpb)).alias("b")
    ).select("doc", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))
    if max_bucket is not None:
        sizes = bands.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_bn"))
        bands = bands.join(
            sizes.filter(F.col("_bn") <= max_bucket), ["band", "bucket"]
        ).drop("_bn")
    return bands


def lsh_candidate_pairs_from_shingles(
    shingle_df: DataFrame,
    num_perm: int = 8,
    num_bands: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), distinct, from a (doc,
    shs) shingle-array table — lets one persisted shingle pass feed
    both the signature path and the Jaccard-verify join."""
    bands = lsh_band_table(shingle_df, num_perm, num_bands, max_bucket)
    # The self-join would recompute the whole shingle→md5→signature
    # lineage for each side; persist the (tiny: one row per doc per
    # band) band table so the expensive pass runs once.
    bands = bands.transform(persist_tracked)
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(y, ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs_across(
    batch_shingles: DataFrame,
    corpus_shingles: DataFrame,
    num_perm: int = 8,
    num_bands: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs ACROSS two corpora: (doc_a from
    batch, doc_b from corpus), distinct — the incremental-ingestion
    shape (dedupe a new batch against an existing corpus WITHOUT
    re-pairing the corpus against itself).

    Scale design: at 100 TB the corpus band table is computed once
    and stored (it is one row per doc per band — tiny next to the
    text); each incoming batch computes only ITS bands and joins on
    (band, bucket). Work is Σ_b |b_batch|·|b_corpus| — proportional
    to the batch, never corpus², which is what makes continuous
    ingestion dedup feasible where a full-corpus re-pair is not.
    """
    ba = lsh_band_table(batch_shingles, num_perm, num_bands, max_bucket).transform(persist_tracked)
    bb = lsh_band_table(corpus_shingles, num_perm, num_bands, max_bucket).transform(persist_tracked)
    return lsh_candidate_pairs_from_bands(ba, bb)


def lsh_candidate_pairs_from_bands(
    batch_bands: DataFrame, corpus_bands: DataFrame
) -> DataFrame:
    """The across-corpora candidate join given PREBUILT band tables —
    for callers that amortize the corpus band table over many batches
    (streaming/lifecycle.py persists it once per drain instead of
    recomputing the corpus minhash pass per micro-batch)."""
    return (
        batch_bands.alias("x")
        .join(corpus_bands.alias("y"), ["band", "bucket"])
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 8,
    num_bands: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs straight from a text column
    (compose doc_shingles + lsh_candidate_pairs_from_shingles)."""
    return lsh_candidate_pairs_from_shingles(
        doc_shingles(df, key_col, text_col, k, spread=True),
        num_perm=num_perm,
        num_bands=num_bands,
        max_bucket=max_bucket,
    )


def embedding_near_dup_drops(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dedup with keep-first survivor policy.

    Candidate pairs come from the random-hyperplane LSH bucket join
    (operators/similarity.lsh_near_dup_pairs — Σ|bucket|² work, not
    N²); a vector is dropped iff it has a neighbor with cosine ≥
    threshold and a smaller id. Returns (key, dup_of = smallest such
    neighbor) — the drop list a dedup pipeline anti-joins against.
    """
    from ae_data_integration_spark.operators.similarity import lsh_near_dup_pairs

    pairs = lsh_near_dup_pairs(emb, key_col, vec_col, bits=bits, threshold=threshold)
    return pairs.groupBy(F.col("id_b").alias(key_col)).agg(
        F.min("id_a").alias("dup_of")
    )


def jaccard_verify(
    pairs: DataFrame,
    shingle_df: DataFrame,
    threshold: float = 0.0,
    prune: bool | None = None,
) -> DataFrame:
    """Exact set Jaccard for candidate pairs, over 48-bit-hashed
    shingles.

    Each doc's shingle set is mapped (map-side, before any shuffle)
    to a DISTINCT array of 48-bit md5 longs — the same hash the
    minhash signature path uses — and |A∩B| / |A∪B| runs on longs via
    JVM array_intersect. Counts are integers and the division is one
    IEEE op, so results are bit-portable; the paired DuckDB oracles
    replay the identical hashing (list_distinct over the `hashed`
    CTE), so the value-hash gate is exact by construction, and the
    Jaccard VALUES equal the raw string-set values unless two
    distinct shingles of the same pair collide in 48 bits
    (~|shs|²/2^49 ≈ 1e-10 per pair; measured zero across every SF
    including 100x).

    Why hashed: the verify join ships one array per pair side, and at
    the 100x scale leg the string form moved ~25-50 KB/doc of shingle
    text through the shuffle and hashed every string again inside
    array_intersect's set build — 54.4 s for 2.7M pairs; the 8-byte
    long form measured 7.3 s for the identical result (r8).

    Why pruned at scale (r10): only docs that appear in a candidate
    pair need their hashed arrays, and the candidate DOC set is small
    by LSH design (r ~ log N holds candidates ~linear in the batch —
    if it weren't small, no verify strategy would be feasible).
    Broadcasting it filters the corpus-sized array side MAP-SIDE, so
    the verify shuffle carries |candidate docs| arrays instead of
    |corpus| — the unpruned form shipped ~12 GB of shingle arrays at
    the 1000x spot leg and starved execution memory
    (UNABLE_TO_ACQUIRE_MEMORY, SCALE_SPOT_r10 first attempt). When
    pruning, ``pairs`` is persisted (tracked, pair-ids-only) because
    the broadcast makes it a second consumer.

    Why ADAPTIVE (``prune=None``): the prune adds three fixed stages
    (pairs cache, doc-set distinct, broadcast build) that cost ~1-2 s
    of codegen/scheduling — pure overhead on a sub-second fixture
    query, pure necessity at the third decade. The switch reads
    Catalyst's sizeInBytes estimate for the shingle side (driver-side
    plan stats, no job; measured 0.3 MB at sf0.1, 24 MB at 100x,
    277 MB at 1000x) and prunes above 128 MB — the same
    size-threshold logic Spark's own broadcast planning applies.
    Results are identical either way; tests pin both branches.
    """
    if prune is None:
        try:
            est = int(str(
                shingle_df._jdf.queryExecution().optimizedPlan()
                .stats().sizeInBytes()
            ))
            prune = est > 128 * 1024 * 1024
        except Exception:  # noqa: BLE001 - stats are an optimization only
            prune = True  # unknown size: take the scale-safe branch
    hs = F.array_distinct(
        F.transform(
            "shs",
            lambda x: F.conv(F.substring(F.md5(x), 1, 12), 16, 10).cast("long"),
        )
    )
    if prune:
        pairs = persist_tracked(pairs)
        cand_docs = (
            pairs.select(F.col("doc_a").alias("doc"))
            .unionByName(pairs.select(F.col("doc_b").alias("doc")))
            .distinct()
        )
        hashed = shingle_df.join(F.broadcast(cand_docs), "doc").select(
            F.col("doc"), hs.alias("hs")
        )
    else:
        hashed = shingle_df.select(F.col("doc"), hs.alias("hs"))
    a = hashed.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = hashed.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = (F.size("hs_a") + F.size("hs_b")).cast("double") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, key_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """SimHash fingerprint over whitespace tokens.

    Each token hashes to `bits` bits (md5 hex → bigint; 60 bits keeps
    the value positive in every engine); bit j contributes +1/-1 to
    accumulator j; the sign vector re-packs into a bigint fingerprint.

    Entirely per-row array folds — NO explode, NO shuffle: the whole
    fingerprint is one narrow projection, embarrassingly parallel at
    any scale. Bit masks come from a literal power-of-two array
    (element_at with a computed index) because shiftleft/shiftright
    take only literal shift amounts in the DataFrame API.
    """
    pow2 = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    hashes = F.transform(
        tokens(text_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    with_h = df.select(
        F.col(key_col).alias("doc"), hashes.alias("hs"), pow2.alias("p2")
    )

    def bit_pop(j):
        mask = F.element_at(F.col("p2"), (j + 1).cast("int"))
        return F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    sim = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(bit_pop(j) > 0, F.element_at(F.col("p2"), (j + 1).cast("int")))
        .otherwise(F.lit(0).cast("long")),
    )
    return with_h.select("doc", sim.alias("simhash"))


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_iters: int = 4,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components of the verified
    candidate-pair graph, as min-label propagation with pointer
    jumping unrolled for a FIXED n_iters.

    This is the canonical-doc-selection step of a curation pipeline
    (cluster near-dups, keep one per cluster). A fixed iteration count
    makes the operator deterministic and SQL-replayable (every step is
    integer mins/joins — bit-exact on any engine); each pass takes the
    min label over neighbors (hop) then the label of the node named by
    the current label (jump). GUARANTEED reach is only +1 per pass
    (the jump shortcuts only when the current label-node itself
    already knows a smaller label — on adversarial id layouts, e.g. a
    chain whose min id sits mid-path, there is NO doubling), so size
    n_iters to the worst-case distance-to-component-min of the graphs
    at hand, not to log2(diameter). Near-dup graphs are unions of
    bucket cliques with tiny diameters, so 4 passes cover them with
    big margin (the exactness is golden-tested against a union-find
    in tests, and the DBSCAN catalog twin — whose chain-like core
    graphs needed 14 passes at sf0.01 — unrolls 16).
    Cost: n_iters key-shuffles of the
    (nodes ∪ edges)-sized relations — same shape as the DBSCAN
    component solver (operators/dbscan.py), minus the convergence
    loop, so the whole thing stays one static Catalyst plan.

    Returns (cluster_root, n_docs) per component, smallest member id
    as the root; singleton docs (no candidate pair) are not rows —
    a dedup keep-list is `anti-join drops` where drops = members with
    id != cluster_root (see ``dup_labels`` for the per-member view).
    """
    return (
        dup_labels(pairs, a_col, b_col, n_iters)
        .groupBy(F.col("lbl").alias("cluster_root"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("cluster_root")
    )


def dup_labels(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_iters: int = 4,
) -> DataFrame:
    """Per-member component labels (id, lbl) for the candidate-pair
    graph — the raw output dup_clusters aggregates; lbl is the
    smallest reachable member id (within the n_iters unroll)."""
    # Materialize the graph and every label generation EAGERLY: each
    # pass references the previous generation three times
    # (neighbor-min, identity, jump), so a lazy unroll re-executes the
    # upstream candidate pipeline ~3^n_iters times — and lazy persists
    # don't save it, because the referencing stages race to compute
    # the still-uncached parent. localCheckpoint (eager) computes each
    # generation once and rebases the plan on the cached blocks, the
    # same lineage-truncation discipline as the DBSCAN solver.
    # checkpoint BEFORE the symmetrizing union: its two branches each
    # read `e`, and an unmaterialized e runs the upstream verify
    # pipeline twice (the g6b lesson, SCALE_SPOT_r12 phase isolation)
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint()
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(n_iters):
        nb = (
            edges.join(labels.select(F.col("id").alias("_nid"), "lbl"),
                       edges.b == F.col("_nid"))
            .groupBy("a")
            .agg(F.min("lbl").alias("nb"))
        )
        hop = (
            labels.join(nb, labels.id == nb.a, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nb"), F.col("lbl"))).alias("lbl"),
            )
        )
        jump = labels.select(F.col("id").alias("lbl"), F.col("lbl").alias("_l2"))
        labels = hop.join(jump, "lbl", "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce(F.col("_l2"), F.col("lbl"))).alias("lbl"),
        ).localCheckpoint()
    return labels


def semantic_dedup_lsh(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int = 16,
    threshold: float = 0.9,
    salt: str = "p4b",
    max_bits: int = 20,
) -> tuple[DataFrame, int, int]:
    """SemDeDup with the PRODUCTION-SCALE quantizer: random-hyperplane
    LSH buckets whose count grows with the corpus, instead of the
    k-pinned KMeans that `semantic_dedup` uses for oracle replay.

    bits = smallest b with 2^b * target_cluster_size >= N (an integer
    rule, engine-portable — no float log2 at a ceil boundary), so the
    expected bucket size stays ~target_cluster_size at every corpus
    size and the within-bucket pair stage does Sigma_b |b|^2 ~
    N * target work — LINEAR in N. That is the paper's k ~ N recipe
    (Abbas et al. 2023 use 100k clusters for 5B docs) realized with a
    quantizer whose ASSIGNMENT is also scale-safe: hyperplane
    signatures cost O(N * bits * d) with zero shuffle, where exact
    assignment to k ~ N KMeans centroids would be O(N^2 d / target) —
    quadratic, which is why faiss-style systems assign approximately.

    Precision is exact (every drop is verified by exact cosine inside
    its bucket); the approximation only costs recall (a near-dup pair
    split across buckets survives), the same trade SemDeDup itself
    makes at cluster boundaries.

    Returns (assignment, bits, n): assignment is (id, cluster,
    is_dup); survivors are is_dup = false. The plan-time count() that
    sizes `bits` is one metadata-cheap job, same discipline as
    similarity._vec_dim.
    """
    from ae_data_integration_spark.functions.arrays import l2_norm, to_double
    from ae_data_integration_spark.operators.similarity import (
        _cos_with_norms,
        _vec_dim,
        _widen,
        hyperplane_signature,
    )

    n = emb.count()
    bits = next(
        b for b in range(max_bits + 1)
        if (1 << b) * target_cluster_size >= n or b == max_bits
    )
    d = _vec_dim(emb, vec_col)
    sig = (
        _widen(emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("vec")))
        .select(
            "id", "vec",
            l2_norm("vec").alias("nrm"),
            hyperplane_signature("vec", bits, salt=salt, dim=d or 64).alias("cluster"),
        )
        .transform(persist_tracked)
    )
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", _cos_with_norms("a.vec", "b.vec", "a.nrm", "b.nrm", d))
        .filter(F.col("cos") >= threshold)
    )
    dropped = pairs.select(F.col("b.id").alias("id")).distinct().withColumn(
        "is_dup", F.lit(True)
    )
    assignment = (
        sig.select("id", "cluster")
        .join(dropped, "id", "left")
        .select("id", "cluster", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
    )
    return assignment, bits, n


def semantic_dedup(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_iter: int = 1,
    threshold: float = 0.9,
    salt: str = "sd",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse KMeans, then
    compare pairs only WITHIN a cluster; a doc is a semantic dup if
    some same-cluster doc with a smaller id has cosine >= threshold.

    Returns the full assignment (id, cluster, is_dup) — survivors are
    `is_dup = false`; a curation pipeline anti-joins the dups out.

    Everything is deterministic (md5-seeded quantizer, left-fold
    dots), so a SQL oracle replays cluster -> pairs -> drop-rule end
    to end.

    Scale design (100 TB): the cluster self-join does Sigma_c |c|^2
    cosine evaluations — the SemDeDup trick is that k grows with the
    corpus (k ~ N / target_cluster_size, e.g. 100k clusters for 5B
    docs in the paper) so |c| stays bounded and the quadratic term
    never materializes; the catalog query pins a tiny k only so the
    DuckDB oracle can replay the quantizer. Centroid assignment is a
    broadcast (k x d) against one corpus scan; the pair join shuffles
    on the cluster key — one shuffle, then per-cluster local work.
    """
    from ae_data_integration_spark.functions.arrays import l2_norm
    from ae_data_integration_spark.operators.kmeans import kmeans_fit
    from ae_data_integration_spark.operators.similarity import (
        _cos_with_norms,
        _vec_dim,
        _widen,
    )

    d = _vec_dim(emb, vec_col)
    assigned, _cents = kmeans_fit(emb, key_col, vec_col, k=k, n_iter=n_iter, salt=salt)
    sig = (
        _widen(assigned.select("id", "vec", "cluster"))
        .withColumn("nrm", l2_norm("vec"))
        .transform(persist_tracked)
    )
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", _cos_with_norms("a.vec", "b.vec", "a.nrm", "b.nrm", d))
        .filter(F.col("cos") >= threshold)
    )
    dropped = pairs.select(F.col("b.id").alias("id")).distinct().withColumn(
        "is_dup", F.lit(True)
    )
    return (
        sig.select("id", "cluster")
        .join(dropped, "id", "left")
        .select("id", "cluster", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
    )


def substring_windows(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 64,
) -> DataFrame:
    """Fingerprint every ``min_len``-char window of every document.

    The primitive under exact-substring deduplication (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): the suffix-array ExactSubstr pass is
    re-expressed, as distributed pipelines do, by stride-1 fixed-
    length window fingerprints — a substring of length >= min_len is
    shared iff all its length-min_len windows are shared.

    Returns (key, pos, fp, kk) with ``pos`` 1-based, ``fp`` the md5
    of the window, and ``kk = key * 2^32 + pos`` the global
    occurrence order key (used for canonical-occurrence election
    without a per-fp window).

    Scale design (100 TB): two-level segmentation keeps the pass
    LINEAR in corpus bytes with a small constant. Naive
    ``substr(text, i, L)`` per window seeks from the string head —
    O(len^2) per doc, the zipf doc-length killer; the all-array form
    (slice + array_join over a char array) is linear but measured 4x
    slower at fixture doc lengths (per-element array allocation in
    the interpreted HOF). Instead: bounded SEGMENTS of 512+L-1 chars
    are cut ONCE each from a materialized char array (O(seg) per
    segment, O(len) per doc, few per doc), exploded, and windows are
    substr'd WITHIN the <= 575-char segment — seek cost bounded by
    the segment, independent of document length. Only the (pos, fp)
    struct survives the window explode; the segment explode carries
    ~1.1 bytes per corpus byte. One scan, no shuffle; ~len rows per
    doc of 44 bytes each.
    """
    seg_w = 512
    t = F.col(text_col)
    src = docs.select(F.col(key_col).alias("key"), t.alias("_t"))
    # narrow-scan rebalance (the doc_shingles spread rule): the window
    # pass is ~200x row fan-out, so input splits < cores leaves most
    # of the box idle exactly where the work is; at corpus scale the
    # scan already has >> cores splits and this self-disables.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par, "key")
    ch = src.select(
        "key", char_array("_t").alias("_ch"), F.length("_t").alias("_n")
    )
    # segment starts 1, 513, 1025, ... <= n-L+1; docs shorter than L
    # produce no segments (and so no windows).
    seg_seq = F.when(
        F.col("_n") >= min_len,
        F.sequence(
            F.lit(1), F.col("_n") - F.lit(min_len - 1), F.lit(seg_w)
        ),
    ).otherwise(F.array().cast("array<int>"))
    segs_arr = F.transform(
        seg_seq,
        lambda s: F.struct(
            s.cast("long").alias("seg_start"),
            F.array_join(
                F.slice(F.col("_ch"), s, seg_w + min_len - 1), ""
            ).alias("seg"),
        ),
    )
    segd = ch.select("key", F.explode(segs_arr).alias("s")).select(
        "key", F.col("s.seg_start").alias("seg_start"), F.col("s.seg").alias("seg")
    )
    # local window positions 1 .. min(seg_w, seglen-L+1): the overlap
    # region only SERVES windows that start in [1, seg_w], so every
    # global position is generated exactly once.
    win_seq = F.sequence(
        F.lit(1),
        F.least(F.lit(seg_w), F.length("seg") - F.lit(min_len - 1)),
    )
    wins_arr = F.transform(
        win_seq,
        lambda i: F.struct(
            (F.col("seg_start") + i.cast("long") - 1).alias("pos"),
            F.md5(F.col("seg").substr(i, F.lit(min_len))).alias("fp"),
        ),
    )
    return (
        segd.select("key", F.explode(wins_arr).alias("w"))
        .select(
            "key",
            F.col("w.pos").alias("pos"),
            F.col("w.fp").alias("fp"),
            (F.col("key").cast("long") * F.lit(2 ** 32) + F.col("w.pos")).alias("kk"),
        )
    )


def substring_duplicate_spans(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 64,
) -> DataFrame:
    """Maximal duplicated substrings per document (exact-substring
    dedup, Lee et al. 2022 arXiv:2107.06499 re-expressed relationally).

    A window occurrence is *duplicated* when its fingerprint occurs
    >= 2 times corpus-wide and it is not the canonical (globally
    first, by (doc, pos)) occurrence — so one copy of every repeated
    block survives, including the intra-document case. Overlapping /
    adjacent duplicated windows are merged into maximal spans by the
    island-and-gap rule (new island iff pos > prev_pos + min_len).

    Returns (key, span_start, span_end, span_len, n_wins), spans
    disjoint and sorted per document.

    Scale design (100 TB): one fp-keyed shuffle for the occurrence
    count + canonical election (map-side combinable min/count — a
    boilerplate fp with millions of occurrences folds partial-agg
    side, never through a per-fp window), one fp-keyed join back, and
    a per-DOCUMENT window for the island merge whose partition is
    bounded by document length, not corpus size.
    """
    from pyspark.sql import Window

    w = substring_windows(docs, key_col, text_col, min_len).transform(persist_tracked)
    dup = (
        w.groupBy("fp")
        .agg(F.min("kk").alias("canon"), F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    # dup is corpus-derived (~1 row per DISTINCT repeated window) and
    # must NEVER broadcast: the optimizer's post-filter size estimate
    # undershoots wildly on replicated corpora (measured: AQE flipped
    # this join to broadcast at 100x and the ~1 GiB build blew
    # spark.driver.maxResultSize). Both sides are already fp-keyed
    # from the election shuffle, so the hint pins the co-located plan
    # that is right at every scale.
    flagged = (
        w.join(dup.hint("shuffle_hash"), "fp")
        .filter(F.col("kk") != F.col("canon"))
        .select("key", "pos")
    )
    return merge_window_islands(flagged, key_col, min_len)


def merge_window_islands(
    flagged: DataFrame, key_col: str = "doc_id", min_len: int = 64
) -> DataFrame:
    """Merge flagged window positions (key, pos) into maximal disjoint
    spans by the island-and-gap rule (new island iff the gap between
    consecutive flagged starts exceeds ``min_len`` — overlap OR
    adjacency merges). The per-key window is bounded by document
    length. Shared by the batch (substring_duplicate_spans) and
    incremental (incremental_span_flags) flag producers."""
    from pyspark.sql import Window

    ww = Window.partitionBy("key").orderBy("pos")
    isl = (
        flagged.withColumn("prev", F.lag("pos").over(ww))
        .withColumn(
            "island",
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("pos") > F.col("prev") + min_len),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).over(ww.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        isl.groupBy("key", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(min_len - 1)).alias("span_end"),
            (F.max("pos") + F.lit(min_len - 1) - F.min("pos") + 1).alias("span_len"),
            F.count(F.lit(1)).alias("n_wins"),
        )
        .select(
            F.col("key").alias(key_col),
            "span_start",
            "span_end",
            "span_len",
            "n_wins",
        )
    )


def incremental_span_flags(
    batch: DataFrame,
    corpus_fps: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 64,
) -> DataFrame:
    """Flagged window positions of an incoming BATCH against an
    existing corpus — the ingestion form of exact-substring dedup.

    A batch window occurrence is duplicated when (a) its fingerprint
    exists in ``corpus_fps`` (the corpus is always canonical:
    ingestion order outranks doc_id — this is where the incremental
    semantics deliberately differ from the batch election, which
    elects the globally smallest (doc, pos)), or (b) its fingerprint
    repeats WITHIN the batch and this occurrence is not the
    batch-canonical one.

    ``corpus_fps`` is the stored artifact of the lifecycle: one row
    per DISTINCT corpus window fingerprint (strictly smaller than
    the occurrence table). At 100 TB it lives as parquet and each
    batch pays one fp-keyed semi join against it — work per drain is
    batch windows + matched fps, and a batch-fp Bloom gate (the
    pipe5c discipline) prunes the corpus-side scan the same way.
    """
    bw = substring_windows(batch, key_col, text_col, min_len).transform(
        persist_tracked
    )
    bdup = (
        bw.groupBy("fp")
        .agg(F.min("kk").alias("canon"), F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    flag_c = bw.join(
        corpus_fps.select("fp").hint("shuffle_hash"), "fp", "leftsemi"
    ).select("key", "pos")
    flag_b = (
        bw.join(bdup.hint("shuffle_hash"), "fp")
        .filter(F.col("kk") != F.col("canon"))
        .select("key", "pos")
    )
    return flag_c.unionByName(flag_b).distinct()


def scrub_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut the duplicated spans out of each affected document.

    Given ``substring_duplicate_spans`` output, rebuilds each
    affected document from the COMPLEMENT intervals (the gaps between
    its disjoint spans plus head/tail), concatenated in position
    order — the curation step that keeps exactly one copy of every
    repeated block corpus-wide while preserving the surrounding
    unique text, instead of dropping whole documents.

    Returns (key, orig_len, n_spans, removed_chars, clean_fp) for
    documents with >= 1 span; ``clean_fp`` is the md5 of the
    scrubbed text (compact enough to value-hash at any scale — the
    full text is one substring expression away for a sink).

    Scale design (100 TB): only span-bearing documents are touched
    (the spans frame drives every join); gap extraction is a per-doc
    lag window over the handful of spans; segment substrings are
    O(len) each over <= n_spans + 1 gaps. The final concat is a
    sorted-struct array_join — no order-dependent string agg.
    """
    from pyspark.sql import Window

    sp = spans.select(
        F.col(key_col).alias("key"), "span_start", "span_end", "span_len"
    ).transform(persist_tracked)
    meta = docs.join(
        sp.select("key").distinct().withColumnRenamed("key", key_col), key_col
    ).select(
        F.col(key_col).alias("key"),
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("long").alias("orig_len"),
    ).transform(persist_tracked)
    ww = Window.partitionBy("key").orderBy("span_start")
    g1 = (
        sp.withColumn("prev_end", F.lag("span_end").over(ww))
        .select(
            "key",
            (F.coalesce("prev_end", F.lit(0)) + 1).alias("gs"),
            (F.col("span_start") - 1).alias("ge"),
        )
        .filter(F.col("ge") >= F.col("gs"))
    )
    g2 = (
        sp.groupBy("key")
        .agg(F.max("span_end").alias("mx"))
        .join(meta.select("key", "orig_len"), "key")
        .filter(F.col("orig_len") >= F.col("mx") + 1)
        .select("key", (F.col("mx") + 1).alias("gs"), F.col("orig_len").alias("ge"))
    )
    segs = (
        g1.unionByName(g2)
        .join(meta.select("key", "_t"), "key")
        .select(
            "key",
            "gs",
            F.col("_t")
            .substr(
                F.col("gs").cast("int"), (F.col("ge") - F.col("gs") + 1).cast("int")
            )
            .alias("seg"),
        )
    )
    cleaned = segs.groupBy("key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("gs", "seg"))),
                lambda s: s["seg"],
            ),
            "",
        ).alias("clean")
    )
    per = sp.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("removed_chars"),
    )
    return (
        per.join(meta.select("key", "orig_len"), "key")
        .join(cleaned, "key", "left")
        .select(
            F.col("key").alias(key_col),
            "orig_len",
            "n_spans",
            "removed_chars",
            F.md5(F.coalesce("clean", F.lit(""))).alias("clean_fp"),
        )
    )
