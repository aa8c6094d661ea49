"""Deduplication queries: exact, MinHash-LSH + Jaccard, SimHash.

Exercises operators/dedup.py. Every stage (shingling, minhash,
banding, bucket join, Jaccard, simhash bit-packing) is reproduced by
the DuckDB oracle from the same md5 primitives — candidate pair sets
and scores are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.operators.dedup import (
    doc_shingles,
    exact_dup_stats,
    jaccard_verify,
    lsh_candidate_pairs_from_shingles,
    simhash,
)
from ae_data_integration_spark.tables import table

# --- D1: exact duplicate stats ----------------------------------------------

_D1_SQL = r"""
SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
       COUNT(*) AS n_distinct,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_redundant
FROM (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp, COUNT(*) AS n
  FROM documents GROUP BY fp
)
"""


@register("y_d1_exact_dup", oracle=_D1_SQL,
          doc="Exact dedup via normalized-text md5 fingerprint groupBy.",
          tags=("dedup",))
def d1_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dup_stats(table(spark, sf_dir, "documents"))


# --- D2: MinHash-LSH candidates + exact Jaccard -----------------------------
# 8 perms, 2 bands × 4 rows → candidate knee around j ≈ 0.84, with a
# long random tail — non-trivial candidate sets on this corpus.

_SHS = (
    "list_distinct(list_transform(range(1, greatest(length(text)-4, 1) + 1),"
    " i -> text[i : i+4]))"
)


def _perm_mins_sql(num_perm: int) -> str:
    """(A[s]*h + B[s]) mod P minima — mirrors minhash_from_base."""
    from ae_data_integration_spark.functions.hashing import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    mins = ", ".join(
        f"list_aggregate(list_transform(hs, h -> ({MINHASH_A[s]} * h + {MINHASH_B[s]}) % {MINHASH_P}), 'min')"
        for s in range(num_perm)
    )
    return f"[{mins}]"


# Verify tail shared by every jaccard_verify oracle: the engine
# verifies over DISTINCT 48-bit-hashed shingle sets (operators/
# dedup.jaccard_verify — the longs-not-strings scale fix, r8), so the
# oracle joins the same hashed sets. `hashed` is the CTE every
# template already builds for the minhash signatures.
_HSET_CTE = "hset AS (SELECT doc_id, list_distinct(hs) AS hs FROM hashed)"
_JACC = (
    "CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)"
    " / (CAST(len(a.hs) + len(b.hs) AS DOUBLE)"
    " - CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE))"
)

_D2_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHS} AS shs FROM documents
),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, shs, {_perm_mins_sql(8)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*4 + 1 : b.b*4 + 4], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
{_HSET_CTE}
SELECT p.doc_a, p.doc_b,
       {_JACC} AS jaccard
FROM pairs p
JOIN hset a ON p.doc_a = a.doc_id
JOIN hset b ON p.doc_b = b.doc_id
ORDER BY doc_a, doc_b
"""


@register("y_d2_minhash_lsh", oracle=_D2_SQL,
          doc="MinHash(8) + LSH(2 bands × 4 rows) candidates, exact shingle Jaccard.",
          tags=("dedup", "bench"))
def d2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # One persisted shingle pass feeds BOTH the signature path and
    # the a/b sides of the verify join (3 consumers, 1 computation).
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    return jaccard_verify(pairs, shs).orderBy("doc_a", "doc_b")


# --- D2b: wide-signature MinHash-LSH (the r ~ log N scale config) ------------
# d2's fixed r=4 signature has a per-band random-collision probability
# of ~(1/2^48)·skew — fine at sf0.1, but the false-positive candidate
# term grows ~N² with corpus size (measured 44.9x wall at 100x data,
# SCALE.md round-9). The r ~ log N rule (rows-per-band grows one row
# per corpus decade, so E[FP] stays ~N) was proven on pipe5b; this
# twin applies the SAME 16-perm / 2 bands x 8 rows configuration to
# the flagship standalone near-dup query and REPLACES d2 in the bench
# scale legs (d2 stays registered as the knee-at-0.84 semantics row).
# Knee moves to (1/2)^(1/8) ≈ 0.917 — true near-dups (j ≈ 1) keep
# colliding; the random tail collapses.

_D2B_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHS} AS shs FROM documents
),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, shs, {_perm_mins_sql(16)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*8 + 1 : b.b*8 + 8], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
{_HSET_CTE}
SELECT p.doc_a, p.doc_b,
       {_JACC} AS jaccard
FROM pairs p
JOIN hset a ON p.doc_a = a.doc_id
JOIN hset b ON p.doc_b = b.doc_id
ORDER BY doc_a, doc_b
"""


@register("d2b_minhash_lsh_wide", oracle=_D2B_SQL,
          doc="MinHash(16) + LSH(2 bands x 8 rows) candidates, exact shingle "
              "Jaccard — the r ~ log N signature width that holds the "
              "false-positive candidate term linear in N (d2's r=4 knee "
              "admits an ~N² random tail, measured 44.9x wall at 100x "
              "data). This is the scale-leg near-dup row; d2 stays as the "
              "low-threshold semantics row.",
          tags=("dedup", "bench"))
def d2b_minhash_lsh_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=16, num_bands=2)
    return jaccard_verify(pairs, shs).orderBy("doc_a", "doc_b")


# --- D5: word-n-gram Jaccard near-dup ---------------------------------------
# Same bounded-candidate machinery as D2 (MinHash bands → bucket
# join → exact verify) but over WORD 3-gram sets — the token-level
# dedup unit for training corpora (char shingles catch near-identical
# bytes; word ngrams catch shared phrasing).

_WNG = (
    "CASE WHEN len({t}) >= 3 THEN "
    "list_distinct(list_transform(range(1, len({t}) - 1), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2])) "
    "ELSE [array_to_string({t}, ' ')] END"
)

_D5_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"

_D5_SQL = f"""
WITH tok AS (SELECT doc_id, {_D5_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, {_WNG.format(t='t')} AS shs FROM tok),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, shs, {_perm_mins_sql(8)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*4 + 1 : b.b*4 + 4], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
{_HSET_CTE}
SELECT p.doc_a, p.doc_b,
       {_JACC} AS jaccard
FROM pairs p
JOIN hset a ON p.doc_a = a.doc_id
JOIN hset b ON p.doc_b = b.doc_id
ORDER BY doc_a, doc_b
"""


@register("d5_ngram_jaccard", oracle=_D5_SQL,
          doc="Word-3-gram Jaccard near-dup: MinHash(8)+LSH(2x4) candidates "
              "over ngram sets, exact set Jaccard verify — token-level twin "
              "of d2's char-shingle dedup.",
          tags=("dedup", "bench"))
def d5_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import tokens, word_ngrams_from_tokens

    d = table(spark, sf_dir, "documents")
    # Tokens land in their own projection: interpreted HOF lambdas get
    # no CSE, so inlining the tokenizer re-splits the text per ngram
    # element (measured 6× slower). Then spread the md5-signature pass
    # across all cores (the source parquet is few partitions at small
    # SF — same fix as doc_shingles(spread=True)).
    tok = d.select(F.col("doc_id").alias("doc"), tokens("text").alias("_toks"))
    par = spark.sparkContext.defaultParallelism
    if tok.rdd.getNumPartitions() < par:
        tok = tok.repartition(par, "doc")
    shs = tok.select("doc", word_ngrams_from_tokens("_toks", 3).alias("shs")).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    return jaccard_verify(pairs, shs).orderBy("doc_a", "doc_b")


# --- D3: SimHash fingerprints -----------------------------------------------

_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"

_D3_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_transform({_TOKS},
                        t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(hs) = 0 THEN 0 ELSE
         list_reduce(
           list_transform(range(0, 60),
             j -> CASE WHEN list_reduce(
                          list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END),
                          (a, b) -> a + b) > 0
                       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END),
           (a, b) -> a + b)
       END AS simhash
FROM tok
ORDER BY doc_id
"""


@register("y_d3_simhash", oracle=_D3_SQL,
          doc="60-bit SimHash fingerprint; shuffle-free per-row array folds.",
          tags=("dedup",))
def d3_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        simhash(d, "doc_id", "text", bits=60)
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    )


# --- D4: embedding-cosine near-dup drop list --------------------------------

from ae_data_integration_spark.catalog.similarity_q import _S2_SQL
from ae_data_integration_spark.operators.dedup import embedding_near_dup_drops

_D4_SQL = f"""
SELECT id_b AS vec_id, MIN(id_a) AS dup_of
FROM ({_S2_SQL})
WHERE cos >= 0.35
GROUP BY id_b
ORDER BY vec_id
"""


@register("y_d4_embedding_neardup", oracle=_D4_SQL,
          doc="Embedding-cosine near-dedup: LSH-bucketed pairs at cosine ≥ "
              "0.35, keep-first survivor policy (drop list + canonical id).",
          tags=("dedup", "similarity"))
def d4_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return embedding_near_dup_drops(e, bits=8, threshold=0.35).orderBy("vec_id")


# --- PIPE1: end-to-end corpus curation --------------------------------------
# The headline training-data flow: exact-dedup (keep-first per
# fingerprint) → quality gate → embedding near-dup removal → per-lang
# corpus stats. Each stage is an operator already ◆-checked alone
# (d1/t2/d4); this query checks their composition.

from ae_data_integration_spark.catalog.text_q import _T2_SQL
from ae_data_integration_spark.functions.portable import Q20, fpavg
from ae_data_integration_spark.functions.text import fingerprint, quality_score

_PIPE1_SQL = f"""
WITH fp AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM documents
),
keep_fp AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
q AS ({_T2_SQL.replace("ORDER BY doc_id", "")}),
drops AS ({_D4_SQL}),
surv AS (
  SELECT d.lang, q.quality
  FROM documents d
  JOIN keep_fp k ON d.doc_id = k.doc_id
  JOIN q ON d.doc_id = q.doc_id
  WHERE q.quality >= 0.5
    AND d.doc_id NOT IN (SELECT vec_id FROM drops)
)
SELECT lang, COUNT(*) AS n_docs,
       (SUM(CAST(round(quality * {Q20}) AS BIGINT)) / {Q20}.0) / CAST(COUNT(*) AS DOUBLE) AS avg_quality
FROM surv GROUP BY lang ORDER BY lang
"""


@register("y_pipe1_corpus_curation", oracle=_PIPE1_SQL,
          doc="Corpus curation end-to-end: exact dedup (keep-first), "
              "quality gate, embedding near-dup removal, per-lang stats.",
          tags=("dedup", "text", "pipeline", "bench"))
def pipe1_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    keep = d.groupBy(fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    drops = embedding_near_dup_drops(e, bits=8, threshold=0.35).select("vec_id")
    surv = (
        d.join(keep, "doc_id", "left_semi")
        .join(drops, F.col("doc_id") == F.col("vec_id"), "left_anti")
        .select("lang", quality_score("text").alias("quality"))
        .filter(F.col("quality") >= 0.5)
    )
    return (
        surv.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            fpavg("quality", Q20).alias("avg_quality"),
        )
        .orderBy("lang")
    )


# --- D6: near-dup clusters (connected components, canonical selection) ------
# Min-label propagation with pointer jumping, UNROLLED for a fixed 4
# passes — every step is integer mins over joins, so the DuckDB replay
# is trivially bit-exact; exactness of the bounded unroll vs true
# connected components is golden-tested against union-find in
# tests/test_operators.py.

_D6_THRESH = 0.5


from ae_data_integration_spark.catalog.cc_sql import cc_unrolled_sql as _cc_unrolled_sql  # noqa: E402


_D6_VERIFIED = f"""WITH sh AS (
  SELECT doc_id, {_SHS} AS shs FROM documents
),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, shs, {_perm_mins_sql(8)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*4 + 1 : b.b*4 + 4], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
{_HSET_CTE},
verified AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN hset a ON p.doc_a = a.doc_id
  JOIN hset b ON p.doc_b = b.doc_id
  WHERE {_JACC} >= {_D6_THRESH}
)"""

_D6_SQL = _cc_unrolled_sql(_D6_VERIFIED, n_iters=4)


@register("d6_dup_clusters", oracle=_D6_SQL,
          doc="Near-dup clusters: connected components over the verified "
              "MinHash-LSH pair graph (jaccard >= 0.5) via pointer-jumping "
              "min-label propagation, fixed 4 passes — the canonical-doc "
              "selection step of corpus curation; oracle replays the "
              "unrolled integer fixpoint CTE-for-CTE.",
          tags=("dedup", "graph"))
def d6_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.dedup import dup_clusters

    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    return dup_clusters(verified, n_iters=4)


# --- PIPE2: end-to-end canonical dedup (cluster → keep one → stats) ---------
# The full curation step d6 enables: detect near-dup clusters, keep
# the smallest-id member per cluster, and report the corpus before /
# after. One row, every number under the value-hash gate — the oracle
# replays candidates, verification, the CC unroll, the drop list, and
# the survivor aggregate end-to-end.

_PIPE2_TAIL = r""",
drops AS (SELECT id AS doc_id FROM l4 WHERE id != lbl),
surv AS (
  SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
),
agg1 AS (
  SELECT COUNT(*) AS n_surviving,
         CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != ''))) AS BIGINT)
           AS surviving_tokens
  FROM surv
)
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       (SELECT COUNT(*) FROM drops) AS n_dropped,
       n_surviving, surviving_tokens
FROM agg1"""

_PIPE2_SQL = _cc_unrolled_sql(_D6_VERIFIED, n_iters=4, tail=_PIPE2_TAIL)


@register("pipe2_canonical_dedup", oracle=_PIPE2_SQL,
          doc="End-to-end canonical dedup: verified LSH pair graph -> "
              "connected components -> drop non-root members (anti-join) -> "
              "survivor count + token mass; single fully-oracled row.",
          # bench-tagged since r8 so the 100x scale leg has a shared-
          # session denominator for the full dedup pipeline
          tags=("dedup", "pipeline", "bench"))
def pipe2_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import token_count
    from ae_data_integration_spark.operators.dedup import dup_labels

    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    labels = dup_labels(verified, n_iters=4)
    drops = labels.filter(F.col("id") != F.col("lbl")).select(
        F.col("id").alias("doc_id")
    )
    surv = d.join(drops, "doc_id", "left_anti")
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    ndrop = drops.agg(F.count(F.lit(1)).alias("n_dropped"))
    agg1 = surv.agg(
        F.count(F.lit(1)).alias("n_surviving"),
        F.sum(token_count("text").cast("long")).alias("surviving_tokens"),
    )
    return (
        tot.crossJoin(F.broadcast(ndrop))
        .crossJoin(F.broadcast(agg1))
        .select("n_docs", "n_dropped", "n_surviving", "surviving_tokens")
    )


# --- G3: PageRank over the verified near-dup graph --------------------------
# Which documents sit at the CENTER of near-duplicate neighborhoods
# (template sources, boilerplate hubs)? Fixed 3-iteration PageRank
# over the same verified pair graph d6 clusters — every step a
# quantized contribution sum the oracle replays generation for
# generation.

_G3_DAMP, _G3_ITERS, _G3_Q = 0.85, 3, 1 << 40


def _g3_sql() -> str:
    steps = []
    for i in range(1, _G3_ITERS + 1):
        steps.append(f""",
r{i} AS MATERIALIZED (
  SELECT e.b AS id,
         ({repr(1.0 - _G3_DAMP)} / CAST((SELECT n FROM nn) AS DOUBLE))
         + {_G3_DAMP!r} * (SUM(CAST(round((r.pr / CAST(d.deg AS DOUBLE)) * {_G3_Q}) AS BIGINT)) / {_G3_Q}.0)
           AS pr
  FROM edges e JOIN r{i - 1} r ON e.a = r.id JOIN deg d ON e.a = d.a
  GROUP BY e.b
)""")
    return f"""{_D6_VERIFIED},
edges0 AS (SELECT doc_a AS a, doc_b AS b FROM verified),
edges AS MATERIALIZED (SELECT a, b FROM edges0 UNION SELECT b AS a, a AS b FROM edges0),
deg AS MATERIALIZED (SELECT a, COUNT(*) AS deg FROM edges GROUP BY a),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS MATERIALIZED (
  SELECT a AS id, 1.0 / CAST((SELECT n FROM nn) AS DOUBLE) AS pr FROM deg
){"".join(steps)}
SELECT id, pr FROM r{_G3_ITERS} ORDER BY id"""


@register("g3_pagerank", oracle=_g3_sql(),
          doc="Fixed 3-iteration PageRank over the verified near-dup pair "
              "graph (boilerplate-hub detection): per iteration one "
              "edges-vs-ranks key join + a 2^-40-quantized contribution "
              "sum — order/partition-independent, replayed CTE-for-CTE.",
          tags=("dedup", "graph"))
def g3_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.graph import pagerank_fixed

    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    return pagerank_fixed(
        verified, n_iters=_G3_ITERS, damping=_G3_DAMP
    ).orderBy("id")


# --- PIPE3: end-to-end LLM training-data prep -------------------------------
# The full chain a pretraining corpus goes through: exact dedup ->
# quality + repetition gates -> sliding-window chunking -> sharded
# sequence packing; one summary row with every number under the
# value-hash gate. Composes d1 (fingerprint), t2 (quality), t6
# (repetition), t7 (chunking), t8 (packing) — same constants, same
# SQL fragments.

_P3_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"
_P3_WNG = (
    "CASE WHEN len(t) >= 3 THEN "
    "list_distinct(list_transform(range(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) "
    "ELSE [array_to_string(t, ' ')] END"
)
_P3_PUNCT = r"[!-/:-@\[-`{-~]"

_PIPE3_SQL = f"""
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
),
surv AS (
  SELECT d.doc_id, d.text, {_P3_TOKS} AS t
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id
),
gated AS (
  SELECT doc_id, t FROM surv
  WHERE (least(CAST(len(t) AS DOUBLE) / 64.0, 1.0)
         + CASE WHEN (list_reduce(list_transform(t, w -> CAST(length(w) AS DOUBLE)), (a,b) -> a+b)
                      / CAST(greatest(len(t), 1) AS DOUBLE)) >= 2.0
                 AND (list_reduce(list_transform(t, w -> CAST(length(w) AS DOUBLE)), (a,b) -> a+b)
                      / CAST(greatest(len(t), 1) AS DOUBLE)) <= 12.0
                THEN 1.0 ELSE 0.0 END
         + (1.0 - least((CAST(length(text) - length(regexp_replace(text, '{_P3_PUNCT}', '', 'g')) AS DOUBLE)
                         / greatest(length(text), 1)) * 4.0, 1.0))
        ) / 3.0 >= 0.5
    AND 1.0 - CAST(len({_P3_WNG}) AS DOUBLE)
              / CAST(greatest(len(t) - 2, 1) AS DOUBLE) <= 0.5
),
nc AS (
  SELECT doc_id, t, greatest((len(t) - 8 + 23) // 24, 1) AS n_chunks FROM gated
),
ch AS (
  SELECT doc_id, i.i AS chunk_id,
         CAST(len(t[i.i * 24 + 1 : i.i * 24 + 32]) AS BIGINT) AS n_tokens
  FROM nc, LATERAL (SELECT unnest(range(0, nc.n_chunks)) AS i) i
),
sh AS (
  SELECT *, CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 16 AS shard
  FROM ch
),
binned AS (
  SELECT shard, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
           // 512 AS BIGINT) AS bin
  FROM sh
),
bins AS (SELECT shard, bin, CAST(SUM(n_tokens) AS BIGINT) AS bt FROM binned GROUP BY shard, bin)
SELECT (SELECT COUNT(*) FROM documents) AS n_docs_in,
       (SELECT COUNT(*) FROM gated) AS n_docs_kept,
       (SELECT COUNT(*) FROM ch) AS n_chunks,
       (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM ch) AS total_tokens,
       (SELECT COUNT(*) FROM bins) AS n_bins,
       (SELECT CAST(SUM(bt) AS DOUBLE) / (COUNT(*) * 512.0) FROM bins) AS mean_fill
"""


@register("pipe3_training_prep", oracle=_PIPE3_SQL,
          doc="End-to-end LLM training-data prep: exact dedup (d1 "
              "fingerprint) -> quality >= 0.5 AND repetition <= 0.5 gates "
              "(t2/t6) -> sliding-window chunking (t7) -> sharded sequence "
              "packing (t8); one summary row, every number value-hashed.",
          tags=("dedup", "text", "chunking", "pipeline", "bench"))
def pipe3_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import (
        punct_ratio,
        tokens,
        word_ngrams_from_tokens,
    )
    from ae_data_integration_spark.operators.chunking import chunk_tokens, pack_chunks

    d = table(spark, sf_dir, "documents")
    keep = d.groupBy(fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # persist = a real materialization barrier: Catalyst pushes the
    # gate predicate below this projection otherwise, substituting t
    # -> tokens(text) into EVERY interpreted-HOF reference (measured
    # 10s vs 1s at sf0.1 — the no-CSE-in-lambdas trap).
    surv = d.join(keep.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "text", tokens("text").alias("t")
    ).transform(persist_tracked)
    # Quality from the MATERIALIZED token column (quality_score(text)
    # would re-tokenize once per interpreted-HOF term — no CSE in
    # lambda land; same arithmetic, same oracle expression).
    n_tok = F.size("t").cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    wl = F.aggregate(
        F.transform("t", lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.greatest(F.size("t"), F.lit(1)).cast("double")
    wl_score = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    p_score = F.lit(1.0) - F.least(punct_ratio("text") * F.lit(4.0), F.lit(1.0))
    quality = (len_score + wl_score + p_score) / F.lit(3.0)
    rep = F.lit(1.0) - F.size(word_ngrams_from_tokens("t", 3)).cast("double") / (
        F.greatest(F.size("t") - F.lit(2), F.lit(1)).cast("double")
    )
    # Persist the gate output and the chunk table: four downstream
    # aggregates would otherwise re-run the dedup+gate+chunk chain
    # once each (measured 30s vs 3s at sf0.1).
    gated = surv.filter((quality >= 0.5) & (rep <= 0.5)).select(
        "doc_id", "text"
    ).transform(persist_tracked)
    ch = chunk_tokens(gated, "doc_id", "text", chunk=32, overlap=8).transform(persist_tracked_if_small)
    bins = pack_chunks(ch, "doc_id", ctx=512, n_shards=16)
    n_docs_in = d.count()
    g = gated.count()
    cstat = ch.agg(
        F.count(F.lit(1)).alias("nc"), F.sum("n_tokens").alias("tt")
    ).first()
    bstat = bins.agg(
        F.count(F.lit(1)).alias("nb"),
        (F.sum("bin_tokens").cast("double") / (F.count(F.lit(1)) * F.lit(512.0))).alias("fill"),
    ).first()
    return spark.createDataFrame(
        [(n_docs_in, g, cstat["nc"], cstat["tt"], bstat["nb"], bstat["fill"])],
        "n_docs_in long, n_docs_kept long, n_chunks long, total_tokens long, "
        "n_bins long, mean_fill double",
    )


# --- PIPE4: SemDeDup-style semantic deduplication ---------------------------
# Cluster embeddings with the md5-seeded coarse quantizer (the s3/IVF
# machinery), then drop any vector with a same-cluster neighbor at
# cosine >= threshold and a smaller id (SemDeDup, arXiv:2303.09540 —
# the keep-one-per-semantic-neighborhood curation step). The oracle
# replays quantizer -> within-cluster pairs -> drop rule -> per-
# cluster stats end to end. k is pinned tiny for the oracle replay;
# at corpus scale k grows ~N/target_cluster_size so the within-
# cluster quadratic never materializes (operators/dedup.semantic_dedup).

from ae_data_integration_spark.catalog.kmeans_q import _assign_cte, _update_cte
from ae_data_integration_spark.operators.dedup import semantic_dedup

_P4_K, _P4_THRESH = 5, 0.35
_P4_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_P4_SQ = "list_reduce(list_transform({a}, x -> x * x), (p, q) -> p + q)"
_P4_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
    " (x, y) -> x + y)"
)

_PIPE4_SQL = f"""
WITH pts AS (SELECT vec_id AS id, {_P4_V} AS vec FROM embeddings),
init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('sd' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts ORDER BY md5('sd' || CAST(id AS VARCHAR)), id LIMIT {_P4_K})
),
{_assign_cte('pts', 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.id < b.id
  WHERE {_P4_DOT.format(a='a.vec', b='b.vec')}
          / greatest(sqrt({_P4_SQ.format(a='a.vec')}) * sqrt({_P4_SQ.format(a='b.vec')}), 1e-12)
        >= {_P4_THRESH}
),
dropped AS (SELECT DISTINCT id_b AS id FROM pairs)
SELECT a.cluster, COUNT(*) AS n,
       CAST(SUM(CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       MIN(CASE WHEN d.id IS NULL THEN a.id END) AS min_kept_id
FROM a2 a LEFT JOIN dropped d ON a.id = d.id
GROUP BY a.cluster
ORDER BY a.cluster
"""


@register("pipe4_semantic_dedup", oracle=_PIPE4_SQL,
          doc="SemDeDup: md5-seeded coarse KMeans clusters, within-cluster "
              "cosine >= 0.35 drop rule (keep smallest id), per-cluster "
              "keep/drop stats; oracle replays the full chain.",
          tags=("dedup", "similarity", "bench"))
def pipe4_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    sd = semantic_dedup(e, k=_P4_K, n_iter=1, threshold=_P4_THRESH, salt="sd")
    dup = F.when(F.col("is_dup"), 1).otherwise(0)
    return (
        sd.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dup).alias("n_dup"),
            F.sum(1 - dup).alias("n_kept"),
            F.min(F.when(~F.col("is_dup"), F.col("id"))).alias("min_kept_id"),
        )
        .orderBy("cluster")
    )


# --- PIPE4b: SemDeDup at the PRODUCTION scale point (k ∝ N quantizer) -------
# pipe4 pins k=5 KMeans clusters so DuckDB can replay the quantizer —
# deliberately quadratic (Σ|c|² ~ N²/5) and therefore excluded from
# the bench scale legs. THIS query is the configuration a 100-TB run
# ships: the quantizer is the random-hyperplane LSH signature with
# bits sized so bucket count GROWS with the corpus (smallest b with
# 2^b * target >= N, an integer rule both engines evaluate
# identically), holding expected bucket size ~constant — the
# within-bucket pair stage is Σ|b|² ~ N·target, linear per decade.
# Fully oracled: DuckDB recomputes N, bits, every md5 hyperplane,
# the bucketed pair join, the exact-cosine drop rule, and the
# one-row summary. Precision is exact (drops are cosine-verified);
# the approximation costs only recall at bucket boundaries — the
# same trade the paper's k-means partition makes.

_P4B_TARGET, _P4B_THRESH, _P4B_SALT = 16, 0.35, "p4b"

_P4B_MD5U = (
    f"CAST(('0x' || substr(md5('{_P4B_SALT}' || {{key}}), 1, 12)) AS BIGINT)"
    " / 281474976710656.0"
)


def _p4b_proj(j: str) -> str:
    # Width comes from the vector itself (len(v)), matching the Spark
    # side's runtime _vec_dim probe — a fixture-width change breaks
    # neither side, or both identically, never silently one.
    unit = _P4B_MD5U.format(key=f"{j} || ':' || p[2]")
    return (
        f"list_reduce(list_transform(list_zip(v, range(0, len(v))),"
        f" p -> p[1] * ({unit} - 0.5)), (a, b) -> a + b)"
    )


_PIPE4B_SQL = f"""
WITH e AS (SELECT vec_id AS id, {_P4_V} AS vec FROM embeddings),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
bq AS (
  SELECT CAST(MIN(t.b) AS INT) AS bits
  FROM range(0, 21) t(b), nb
  WHERE (CAST(1 AS BIGINT) << CAST(t.b AS INT)) * {_P4B_TARGET} >= nb.n OR t.b = 20
),
sig AS (
  SELECT id, vec AS v,
         list_reduce(
           list_transform(range(0, (SELECT bits FROM bq)),
             j -> CASE WHEN {_p4b_proj('j')} > 0
                       THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END),
           (a, b) -> a + b) AS cluster
  FROM e
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sig a JOIN sig b ON a.cluster = b.cluster AND a.id < b.id
  WHERE {_P4_DOT.format(a='a.v', b='b.v')}
          / greatest(sqrt({_P4_SQ.format(a='a.v')}) * sqrt({_P4_SQ.format(a='b.v')}), 1e-12)
        >= {_P4B_THRESH}
),
dropped AS (SELECT DISTINCT id_b AS id FROM pairs),
per_cluster AS (
  SELECT s.cluster,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM sig s LEFT JOIN dropped d ON s.id = d.id
  GROUP BY s.cluster
)
SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_vectors,
       (SELECT CAST(bits AS BIGINT) FROM bq) AS bits,
       CAST(COUNT(*) AS BIGINT) AS n_clusters_used,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_cluster,
       CAST(COALESCE(SUM(n_dup), 0) AS BIGINT) AS n_dup,
       CAST(COALESCE(SUM(n) - SUM(n_dup), 0) AS BIGINT) AS n_kept
FROM per_cluster
"""


@register("pipe4b_semantic_dedup_scaled", oracle=_PIPE4B_SQL,
          doc="SemDeDup at the production scale point: hyperplane-LSH "
              "quantizer with bucket count ∝ N (bits = min b with 2^b * "
              f"{_P4B_TARGET} >= N), exact-cosine drop rule within buckets, "
              "one-row summary. Within-bucket pair work ~ N*target — "
              "linear per decade where pipe4's oracle-pinned k=5 is "
              "quadratic. Fully oracled incl. the bits rule.",
          tags=("dedup", "similarity", "pipeline", "bench"))
def pipe4b_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.dedup import semantic_dedup_lsh

    e = table(spark, sf_dir, "embeddings")
    assignment, bits, _n = semantic_dedup_lsh(
        e, target_cluster_size=_P4B_TARGET, threshold=_P4B_THRESH,
        salt=_P4B_SALT,
    )
    dup = F.when(F.col("is_dup"), 1).otherwise(0)
    per_cluster = assignment.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"), F.sum(dup).alias("n_dup")
    )
    return per_cluster.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_vectors"),
        F.lit(bits).cast("long").alias("bits"),
        F.count(F.lit(1)).alias("n_clusters_used"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("max_cluster"),
        F.coalesce(F.sum("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
        F.coalesce(F.sum("n") - F.sum("n_dup"), F.lit(0)).cast("long").alias("n_kept"),
    )


# --- PIPE5: incremental ingestion dedup (new batch vs existing corpus) ------
# The continuous-ingestion shape: an incoming batch (doc_id % 5 == 0
# stands in for "today's crawl") is deduped against the existing
# corpus (the rest) WITHOUT re-pairing the corpus against itself —
# exact fingerprint anti-join first, then MinHash-LSH candidates
# ACROSS the two sides (batch bands x corpus bands — work is
# proportional to the batch, never corpus^2), hashed-shingle Jaccard
# verify, survivors ingested. At 100 TB the corpus band table is a
# stored artifact (one row per doc per band); each batch computes
# only its own bands (operators/dedup.lsh_candidate_pairs_across).

from ae_data_integration_spark.operators.dedup import lsh_candidate_pairs_across
from ae_data_integration_spark.functions.caching import (
    persist_tracked,
    persist_tracked_if_small,
)

_P5_THRESH = 0.5
_P5_FP_T = r"md5(trim(regexp_replace(lower({t}), '\s+', ' ', 'g')))"

_PIPE5_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHS} AS shs FROM documents
),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
corpus_fp AS (
  SELECT DISTINCT {_P5_FP_T.format(t='text')} AS fp FROM documents WHERE doc_id % 5 != 0
),
b1 AS (
  SELECT d.doc_id, d.n_chars
  FROM documents d LEFT JOIN corpus_fp f ON {_P5_FP_T.format(t='d.text')} = f.fp
  WHERE d.doc_id % 5 = 0 AND f.fp IS NULL
),
sig AS (
  SELECT doc_id, {_perm_mins_sql(8)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*4 + 1 : b.b*4 + 4], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN b1 ON x.doc_id = b1.doc_id
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND y.doc_id % 5 != 0
),
{_HSET_CTE},
near_dup AS (
  SELECT DISTINCT p.doc_a AS doc_id
  FROM cand p
  JOIN hset a ON p.doc_a = a.doc_id
  JOIN hset b ON p.doc_b = b.doc_id
  WHERE {_JACC} >= {_P5_THRESH}
)
SELECT b1.doc_id, b1.n_chars
FROM b1 LEFT JOIN near_dup n ON b1.doc_id = n.doc_id
WHERE n.doc_id IS NULL
ORDER BY b1.doc_id
"""


@register("pipe5_incremental_dedup", oracle=_PIPE5_SQL,
          doc="Incremental ingestion dedup: exact-fingerprint anti-join, "
              "then cross-corpus MinHash-LSH + Jaccard >= 0.5 against the "
              "existing corpus; returns the ingested survivor docs.",
          tags=("dedup", "bench"))
def pipe5_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import fingerprint

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct()
    b1 = (
        batch.withColumn("fp", fingerprint("text"))
        .join(corpus_fp, "fp", "left_anti")
        .select("doc_id", "n_chars", "text")
        .transform(persist_tracked)
    )
    # NOT cached (r10): a corpus-sized shingle cache pinned enough
    # storage memory at the 1000x spot leg to starve execution
    # (UNABLE_TO_ACQUIRE_MEMORY). The band table is the small reusable
    # artifact; the verify side recomputes shingles for the
    # broadcast-pruned candidate docs only (jaccard_verify r10 note).
    sh_b = doc_shingles(b1, "doc_id", "text", k=5, spread=True)
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)
    cands = lsh_candidate_pairs_across(sh_b, sh_c, num_perm=8, num_bands=2)
    near = (
        jaccard_verify(cands, sh_b.unionByName(sh_c), threshold=_P5_THRESH)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    return (
        b1.join(near, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


# --- PIPE5b: incremental dedup with the WIDE signature (scale config) --------
# The round-9 scale audit isolated pipe5's superlinear 100x term: it
# was NOT the ordered survivor materialization (0.9 s of 43.8 s) but
# LSH FALSE-POSITIVE CANDIDATE GROWTH at fixed signature width —
# with 2 bands x 4 rows the per-band collision probability of
# moderately-similar pairs is a constant, so candidate pairs grow
# ~|batch| x |corpus| x const: measured 56.9k -> 870k (15.3x per
# decade) while true near-dups grew ~10x. The production rule is to
# WIDEN the signature as the corpus grows (rows-per-band r ~ log N:
# collision prob s^r for an s-similar pair must shrink like 1/N to
# hold E[FP] ~ N). This is that next configuration step — 2 bands x
# 8 rows — fully oracled like pipe5: measured at 100x, candidates
# collapse 870k -> 10.4k (11.2x per decade — linear) while retaining
# 98.2% of the r=4 drop set (the lost 1.8% sit at jaccard 0.5-0.6
# where the sharper S-curve trades recall). Wall at N=200k is EQUAL
# to r=4 (23.9 vs 24.4 s, fresh JVMs): the candidate collapse is
# bought back by the doubled (linear) minhash cost at this size —
# the wide signature wins ASYMPTOTICALLY, where r=4's ~N^2 FP term
# keeps growing 15.3x/decade; hence r ~ log N, not "widest always".

_PIPE5B_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHS} AS shs FROM documents
),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
corpus_fp AS (
  SELECT DISTINCT {_P5_FP_T.format(t='text')} AS fp FROM documents WHERE doc_id % 5 != 0
),
b1 AS (
  SELECT d.doc_id, d.n_chars
  FROM documents d LEFT JOIN corpus_fp f ON {_P5_FP_T.format(t='d.text')} = f.fp
  WHERE d.doc_id % 5 = 0 AND f.fp IS NULL
),
sig AS (
  SELECT doc_id, {_perm_mins_sql(16)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*8 + 1 : b.b*8 + 8], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN b1 ON x.doc_id = b1.doc_id
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND y.doc_id % 5 != 0
),
{_HSET_CTE},
near_dup AS (
  SELECT DISTINCT p.doc_a AS doc_id
  FROM cand p
  JOIN hset a ON p.doc_a = a.doc_id
  JOIN hset b ON p.doc_b = b.doc_id
  WHERE {_JACC} >= {_P5_THRESH}
)
SELECT b1.doc_id, b1.n_chars
FROM b1 LEFT JOIN near_dup n ON b1.doc_id = n.doc_id
WHERE n.doc_id IS NULL
ORDER BY b1.doc_id
"""


@register("pipe5b_incremental_dedup_wide", oracle=_PIPE5B_SQL,
          doc="pipe5 at the wide-signature scale configuration (MinHash 16, "
              "2 bands x 8 rows): the r ~ log N rule that holds LSH "
              "false-positive candidates linear in corpus size — measured "
              "at 100x: candidates 870k -> 10.4k (the r=4 FP term grows "
              "15.3x/decade), wall equal to r=4 at this SF, 98.2% of its "
              "drop set retained.",
          tags=("dedup", "bench"))
def pipe5b_incremental_dedup_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import fingerprint

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct()
    b1 = (
        batch.withColumn("fp", fingerprint("text"))
        .join(corpus_fp, "fp", "left_anti")
        .select("doc_id", "n_chars", "text")
        .transform(persist_tracked)
    )
    # NOT cached (r10): a corpus-sized shingle cache pinned enough
    # storage memory at the 1000x spot leg to starve execution
    # (UNABLE_TO_ACQUIRE_MEMORY). The band table is the small reusable
    # artifact; the verify side recomputes shingles for the
    # broadcast-pruned candidate docs only (jaccard_verify r10 note).
    sh_b = doc_shingles(b1, "doc_id", "text", k=5, spread=True)
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)
    cands = lsh_candidate_pairs_across(sh_b, sh_c, num_perm=16, num_bands=2)
    near = (
        jaccard_verify(cands, sh_b.unionByName(sh_c), threshold=_P5_THRESH)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    return (
        b1.join(near, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


# --- PIPE5c: Bloom-gated incremental exact dedup (runtime-filter shape) -----
# pipe5's exact stage anti-joins the batch against the DISTINCT
# corpus fingerprint set — at 100 TB that distinct+anti-join shuffles
# the whole corpus every batch. The production pattern is a runtime
# filter: build a Bloom filter over the BATCH fingerprints (batch is
# the small side; m=4096/k=3 md5 positions, the sk3 sketch), and gate
# the corpus fingerprint scan with three broadcast LEFT SEMI joins —
# map-side, ZERO corpus shuffle. Only corpus fps that might collide
# with the batch survive to the distinct + anti-join, so per-batch
# shuffle volume is ~|batch| + |corpus ∩ bloom(batch)| instead of
# |corpus|. Bloom filters have no false negatives, so the survivor
# set is bit-identical to pipe5's (asserted in tests); false
# positives only cost a few extra fps in the exact check. This is
# what Spark's runtime bloom-join does for equi-joins — spelled out
# here because the anti-join direction isn't covered by it.

_P5C_M = 4096
_P5C_K = 3


def _p5c_pos_sql(fp_expr: str, j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({fp_expr} || ':{j}'), 1, 12)) AS BIGINT)"
        f" % {_P5C_M}"
    )


_P5C_GATED_CTE = f"""bfp AS (
  SELECT DISTINCT {_P5_FP_T.format(t='text')} AS fp FROM documents WHERE doc_id % 5 = 0
),
bloom AS (
  {' UNION '.join(f'SELECT DISTINCT {_p5c_pos_sql("fp", j)} AS pos FROM bfp' for j in range(_P5C_K))}
),
corpus_fp AS (
  SELECT DISTINCT fp FROM (
    SELECT {_P5_FP_T.format(t='text')} AS fp FROM documents WHERE doc_id % 5 != 0
  ) c
  WHERE {' AND '.join(f'({_p5c_pos_sql("c.fp", j)}) IN (SELECT pos FROM bloom)' for j in range(_P5C_K))}
),"""

_PIPE5C_SQL = _PIPE5_SQL.replace(
    f"""corpus_fp AS (
  SELECT DISTINCT {_P5_FP_T.format(t='text')} AS fp FROM documents WHERE doc_id % 5 != 0
),""",
    _P5C_GATED_CTE,
)
assert _PIPE5C_SQL != _PIPE5_SQL  # the splice anchor must exist


@register("pipe5c_bloom_gate", oracle=_PIPE5C_SQL,
          doc="pipe5 with the exact stage behind a batch-fingerprint Bloom "
              "runtime filter (m=4096, k=3 md5 positions): the corpus fp "
              "scan is gated by three broadcast semi-joins map-side, so "
              "the distinct/anti-join shuffles only bloom survivors, never "
              "the corpus. No false negatives -> output bit-identical to "
              "pipe5 (asserted).",
          tags=("dedup", "sketch"))
def pipe5c_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import fingerprint

    def pos(col, j: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(f":{j}"))), 1, 12),
                16, 10,
            ).cast("long")
            % F.lit(_P5C_M)
        )

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    bfp = batch.select(fingerprint("text").alias("fp")).distinct()
    bloom = (
        bfp.select(
            F.explode(
                F.array(*[pos(F.col("fp"), j) for j in range(_P5C_K)])
            ).alias("pos")
        )
        .distinct()
        .transform(persist_tracked)
    )
    cf = corpus.select(fingerprint("text").alias("fp"))
    for j in range(_P5C_K):
        cf = cf.join(
            F.broadcast(bloom.withColumnRenamed("pos", f"p{j}")),
            pos(F.col("fp"), j) == F.col(f"p{j}"),
            "left_semi",
        )
    corpus_fp = cf.distinct()
    b1 = (
        batch.withColumn("fp", fingerprint("text"))
        .join(corpus_fp, "fp", "left_anti")
        .select("doc_id", "n_chars", "text")
        .transform(persist_tracked)
    )
    sh_b = doc_shingles(b1, "doc_id", "text", k=5, spread=True)
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)
    cands = lsh_candidate_pairs_across(sh_b, sh_c, num_perm=8, num_bands=2)
    near = (
        jaccard_verify(cands, sh_b.unionByName(sh_c), threshold=_P5_THRESH)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    return (
        b1.join(near, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


# --- D7: cross-source duplication matrix ------------------------------------
# Data-lineage analytics over the verified near-dup graph: which
# sources duplicate which (mirror sites, scraped re-posts, intra-
# source boilerplate). Joins the verified pair list (the d6/pipe2
# front half, shared CTE text) to each side's source label and
# aggregates to an UNORDERED source-pair matrix — at most
# |sources|^2/2 rows out, however large the corpus. Scale shape: two
# broadcast-able joins to the (doc_id, source) projection plus one
# tiny-key groupBy; all pair-generation cost is the already-bounded
# LSH machinery.

_D7_SQL = f"""{_D6_VERIFIED}
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT CASE WHEN da.source <= db.source THEN v.doc_a ELSE v.doc_b END)
         AS n_docs_a,
       COUNT(DISTINCT CASE WHEN da.source <= db.source THEN v.doc_b ELSE v.doc_a END)
         AS n_docs_b
FROM verified v
JOIN documents da ON v.doc_a = da.doc_id
JOIN documents db ON v.doc_b = db.doc_id
GROUP BY src_a, src_b
ORDER BY src_a, src_b
"""


@register("d7_cross_source_dup_matrix", oracle=_D7_SQL,
          doc="Cross-source duplication matrix: verified near-dup pairs "
              "labeled with each side's source, aggregated to unordered "
              "source pairs with pair and distinct-doc counts.",
          tags=("dedup",))
def d7_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    src = d.select("doc_id", "source")
    v = (
        verified.join(
            F.broadcast(src).withColumnsRenamed(
                {"doc_id": "doc_a", "source": "source_a"}
            ),
            "doc_a",
        )
        .join(
            F.broadcast(src).withColumnsRenamed(
                {"doc_id": "doc_b", "source": "source_b"}
            ),
            "doc_b",
        )
    )
    fwd = F.col("source_a") <= F.col("source_b")
    return (
        v.select(
            F.least("source_a", "source_b").alias("src_a"),
            F.greatest("source_a", "source_b").alias("src_b"),
            F.when(fwd, F.col("doc_a")).otherwise(F.col("doc_b")).alias("da"),
            F.when(fwd, F.col("doc_b")).otherwise(F.col("doc_a")).alias("db"),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("da").alias("n_docs_a"),
            F.countDistinct("db").alias("n_docs_b"),
        )
        .orderBy("src_a", "src_b")
    )


# --- G5: triangle counting over the verified near-dup graph -----------------
# Cohesion analytics: a near-dup pair inside a triangle is corrobor-
# ated by a third witness (bucket-collision pairs that verify by
# chance rarely close triangles). Edges are oriented a < b, so each
# triangle a<b<c is found exactly once by the two-hop join
# (a,b)+(b,c)+(a,c); per-node counts come from exploding the three
# corners. Scale shape: the standard edge-iterator bound — join work
# is Σ_v deg(v)² on the oriented graph; orienting low-id -> high-id
# on id-ordered near-dup graphs keeps out-degrees small, and the
# production refinement (orient by ascending degree, the classic
# Schank-Wagner trick) drops the bound to O(E^1.5) regardless of
# skew. The dup graph is ~|docs| edges, so this is join-bound, never
# scan-bound.

_G5_SQL = f"""{_D6_VERIFIED},
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM verified e1
  JOIN verified e2 ON e1.doc_b = e2.doc_a
  JOIN verified e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
corners AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, COUNT(*) AS n_triangles
FROM corners
GROUP BY doc_id
ORDER BY n_triangles DESC, doc_id
LIMIT 20
"""


@register("g5_triangle_count", oracle=_G5_SQL,
          doc="Per-node triangle counts over the verified near-dup graph "
              "(oriented two-hop join, each triangle found once); top 20.",
          tags=("dedup", "graph"))
def g5_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(persist_tracked_if_small)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = (
        jaccard_verify(pairs, shs, threshold=_D6_THRESH)
        .select("doc_a", "doc_b")
        # three self-join consumers below — compute the LSH+verify
        # lineage once (same discipline as d2's shingle persist)
        .transform(persist_tracked)
    )
    e1 = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = verified.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return (
        corners.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "doc_id")
        .limit(20)
    )


# --- DQ4: dedup mixture drift ------------------------------------------------
# What exact dedup DOES to the source mixture — the report a curation
# run ships next to pipe6's data card: per-source doc counts and
# corpus shares before vs after keep-first exact dedup (the d1/pipe2
# canonical rule), plus the per-source KL(after ‖ before) term that
# quantifies how much the dedup pass re-weighted the mixture a
# downstream t12/pipe7 sampler will see. Duplicate-heavy sources
# shrink; the KL sum is the single drift number to alert on.
#
# Exactness: shares divide exactly-representable longs (bit-portable
# unrounded); the KL term takes a non-correctly-rounded ln, so it is
# rounded to 6 decimals on both sides (the mix_weight discipline).
# Scale shape: one fingerprint groupBy (the d1 aggregate), one
# doc_id-keyed semi join, source-keyed counts, and a 1-row totals
# broadcast — |sources| rows out at any corpus size.

_DQ4_SQL = r"""
WITH per_doc AS (
  SELECT source, doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
),
canon AS (SELECT MIN(doc_id) AS keep_id FROM per_doc GROUP BY fp),
b AS (SELECT source, COUNT(*) AS n_b FROM per_doc GROUP BY source),
a AS (
  SELECT p.source, COUNT(*) AS n_a
  FROM per_doc p JOIN canon c ON p.doc_id = c.keep_id
  GROUP BY p.source
),
tot AS (
  SELECT (SELECT SUM(n_b) FROM b) AS nb_tot,
         (SELECT SUM(n_a) FROM a) AS na_tot
)
SELECT b.source,
       CAST(b.n_b AS BIGINT) AS n_docs_before,
       CAST(COALESCE(a.n_a, 0) AS BIGINT) AS n_docs_after,
       b.n_b / CAST(t.nb_tot AS DOUBLE) AS share_before,
       COALESCE(a.n_a, 0) / CAST(t.na_tot AS DOUBLE) AS share_after,
       CASE WHEN COALESCE(a.n_a, 0) > 0
            THEN round((COALESCE(a.n_a, 0) / CAST(t.na_tot AS DOUBLE))
                       * ln((COALESCE(a.n_a, 0) / CAST(t.na_tot AS DOUBLE))
                            / (b.n_b / CAST(t.nb_tot AS DOUBLE))), 6)
            ELSE 0.0 END AS kl_term
FROM b LEFT JOIN a ON b.source = a.source CROSS JOIN tot t
ORDER BY b.source
"""


@register("dq4_dedup_drift", oracle=_DQ4_SQL,
          doc="Per-source mixture drift under keep-first exact dedup: "
              "before/after doc counts and shares plus the KL(after‖before) "
              "term — the alert metric for dedup re-weighting the mixture. "
              "One fingerprint groupBy + one semi join + source counts; "
              "|sources| rows out at any scale.",
          tags=("dedup", "quality"))
def dq4_dedup_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import fingerprint

    d = table(spark, sf_dir, "documents")
    per_doc = d.select("source", "doc_id", fingerprint("text").alias("fp"))
    canon = per_doc.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = per_doc.join(canon.select("doc_id"), "doc_id", "left_semi")
    b = per_doc.groupBy("source").agg(F.count(F.lit(1)).alias("n_b"))
    a = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_a"))
    tot = b.agg(F.sum("n_b").alias("nb_tot")).crossJoin(
        a.agg(F.sum("n_a").alias("na_tot"))
    )
    share_b = F.col("n_b") / F.col("nb_tot").cast("double")
    n_a0 = F.coalesce("n_a", F.lit(0).cast("long"))
    share_a = n_a0 / F.col("na_tot").cast("double")
    return (
        b.join(a, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_b").alias("n_docs_before"),
            n_a0.alias("n_docs_after"),
            share_b.alias("share_before"),
            share_a.alias("share_after"),
            F.when(
                n_a0 > 0, F.round(share_a * F.log(share_a / share_b), 6)
            )
            .otherwise(F.lit(0.0))
            .alias("kl_term"),
        )
        .orderBy("source")
    )


# --- G6: label-propagation communities over the dup graph --------------------
# Community detection on the verified near-dup graph — the grouping a
# curation run uses when connected components over-merge (a single
# spurious verified pair chains two clusters; LPA needs a MAJORITY of
# neighbor votes to absorb a node, so bridge edges don't fuse dense
# groups). Synchronous updates, 3 fixed iterations, most-frequent-
# neighbor-label with (count DESC, label ASC) tie-break — fully
# deterministic, replayed by the oracle iteration-for-iteration.
# Scale shape per iteration: one edge⋈label join + one (node, label)
# count + one per-node top-1 window, O(E) shuffle rows.


def _lpa_iter_sql(prev: str, out: str) -> str:
    return f"""{out} AS (
  SELECT id, lbl FROM (
    SELECT e.a AS id, l.lbl, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY e.a
                              ORDER BY COUNT(*) DESC, l.lbl) AS rk
    FROM g6e e JOIN {prev} l ON e.b = l.id
    GROUP BY e.a, l.lbl
  ) WHERE rk = 1
)"""


_G6_SQL = f"""{_D6_VERIFIED},
g6e AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM verified
),
g6l0 AS (SELECT DISTINCT a AS id, a AS lbl FROM g6e),
{_lpa_iter_sql('g6l0', 'g6l1')},
{_lpa_iter_sql('g6l1', 'g6l2')},
{_lpa_iter_sql('g6l2', 'g6l3')},
g6s AS (SELECT lbl, COUNT(*) AS community_size FROM g6l3 GROUP BY lbl)
SELECT l.id AS doc_id, l.lbl AS label, g6s.community_size
FROM g6l3 l JOIN g6s ON l.lbl = g6s.lbl
ORDER BY doc_id
"""


@register("g6_label_propagation", oracle=_G6_SQL,
          doc="Label-propagation communities over the verified near-dup "
              "graph: 3 synchronous iterations, majority-neighbor label "
              "with (count DESC, label) tie-break — denser-than-component "
              "groupings where a bridge edge would make CC over-merge; "
              "O(E) shuffle per iteration, oracle replays every "
              "iteration.",
          tags=("dedup", "graph"))
def g6_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.graph import label_propagation_fixed

    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(
        persist_tracked_if_small
    )
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    return label_propagation_fixed(verified, n_iters=3).orderBy("doc_id")


# --- DQ6: dedup audit trail ---------------------------------------------------
# Auditability for the curation pass: every DROPPED document with the
# canonical document that keeps its content and WHICH signal dropped
# it — 'exact' (d1 fingerprint identity, keep-first) or 'near' (the
# pipe2 verified-LSH connected component, jaccard >= 0.5), with exact
# taking precedence for docs caught by both. This is the provenance
# table a data-governance review (or a takedown request) walks: "where
# did this document go, and on what evidence". Scale shape: the d1
# fingerprint aggregate + the already-audited CC unroll + one anti
# semi-difference; |dropped| rows out.

_DQ6_TAIL = r""",
per_doc6 AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
),
keep6 AS (SELECT fp, MIN(doc_id) AS kept_id FROM per_doc6 GROUP BY fp),
exact6 AS (
  SELECT p.doc_id, k.kept_id FROM per_doc6 p
  JOIN keep6 k ON p.fp = k.fp WHERE p.doc_id != k.kept_id
),
near6 AS (SELECT id AS doc_id, lbl AS kept_id FROM l4 WHERE id != lbl)
SELECT doc_id, kept_id, signal FROM (
  SELECT doc_id, kept_id, 'exact' AS signal FROM exact6
  UNION ALL
  SELECT n.doc_id, n.kept_id, 'near' AS signal FROM near6 n
  WHERE n.doc_id NOT IN (SELECT doc_id FROM exact6)
)
ORDER BY doc_id"""

_DQ6_SQL = _cc_unrolled_sql(_D6_VERIFIED, n_iters=4, tail=_DQ6_TAIL)


@register("dq6_dedup_audit", oracle=_DQ6_SQL,
          doc="Dedup audit trail: every dropped doc with its canonical "
              "keeper and the dropping signal — 'exact' (fingerprint "
              "identity, keep-first) or 'near' (verified-LSH connected "
              "component), exact taking precedence. The provenance table "
              "a governance review walks; |dropped| rows out.",
          tags=("dedup", "quality"))
def dq6_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import fingerprint
    from ae_data_integration_spark.operators.dedup import dup_labels

    d = table(spark, sf_dir, "documents")
    per_doc = d.select("doc_id", fingerprint("text").alias("fp"))
    keep = per_doc.groupBy("fp").agg(F.min("doc_id").alias("kept_id"))
    exact = (
        per_doc.join(keep, "fp")
        .filter(F.col("doc_id") != F.col("kept_id"))
        .select("doc_id", "kept_id")
    )
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(
        persist_tracked_if_small
    )
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    near = (
        dup_labels(verified, n_iters=4)
        .filter(F.col("id") != F.col("lbl"))
        .select(F.col("id").alias("doc_id"), F.col("lbl").alias("kept_id"))
        .join(exact.select("doc_id"), "doc_id", "left_anti")
    )
    return (
        exact.withColumn("signal", F.lit("exact"))
        .unionByName(near.withColumn("signal", F.lit("near")))
        .orderBy("doc_id")
    )


# --- G6b: LPA over the WIDE-signature dup graph (the scale config) ------------
# g6's graph front half is the r=4 signature (8 perms, 2x4 bands) —
# the configuration whose false-positive candidate term grows ~N²
# (the r9/r10 pipe5 lesson, re-confirmed by the r11 1000x spot leg on
# g6 itself). The r ~ log N rule applies to the GRAPH families the
# same way it applied to incremental dedup: at the third decade the
# signature must widen to r=8 (16 perms, 2x8 bands) so candidate
# pairs — and with them the verify join and every LPA iteration's
# edge table — stay linear in the corpus. Same LPA semantics,
# iteration-for-iteration oracle replay.

_D6B_VERIFIED = f"""WITH sh AS (
  SELECT doc_id, {_SHS} AS shs FROM documents
),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, shs, {_perm_mins_sql(16)} AS sig FROM hashed
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*8 + 1 : b.b*8 + 8], '|')) AS bucket
  FROM sig, (SELECT unnest(range(0, 2)) AS b) b
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
{_HSET_CTE},
verified AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN hset a ON p.doc_a = a.doc_id
  JOIN hset b ON p.doc_b = b.doc_id
  WHERE {_JACC} >= {_D6_THRESH}
)"""

_G6B_SQL = f"""{_D6B_VERIFIED},
g6e AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM verified
),
g6l0 AS (SELECT DISTINCT a AS id, a AS lbl FROM g6e),
{_lpa_iter_sql('g6l0', 'g6l1')},
{_lpa_iter_sql('g6l1', 'g6l2')},
{_lpa_iter_sql('g6l2', 'g6l3')},
g6s AS (SELECT lbl, COUNT(*) AS community_size FROM g6l3 GROUP BY lbl)
SELECT l.id AS doc_id, l.lbl AS label, g6s.community_size
FROM g6l3 l JOIN g6s ON l.lbl = g6s.lbl
ORDER BY doc_id
"""


@register("g6b_lpa_wide", oracle=_G6B_SQL,
          doc="g6 at the wide-signature scale configuration (MinHash 16, "
              "2 bands x 8 rows — the r ~ log N rule): the same 3-iteration "
              "majority-label LPA over a dup graph whose LSH candidate term "
              "stays linear at the third decade, where the r=4 front half "
              "goes quadratic (r11 spot leg).",
          tags=("dedup", "graph"))
def g6b_lpa_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.graph import label_propagation_fixed

    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).transform(
        persist_tracked_if_small
    )
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=16, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=_D6_THRESH).select(
        "doc_a", "doc_b"
    )
    return label_propagation_fixed(verified, n_iters=3).orderBy("doc_id")


# --- D8 / PIPE10: exact-substring span dedup (Lee et al. 2022) --------------
# The last rung of the dedup ladder: document-granular dedup (d1-d6)
# keeps a whole doc or drops it, but web corpora repeat BLOCKS —
# boilerplate, licenses, quoted passages — inside otherwise-unique
# documents. ExactSubstr (arXiv:2107.06499) removes every repeated
# substring of length >= L corpus-wide, keeping one canonical copy.
# Re-expressed relationally: stride-1 L-char window fingerprints, a
# corpus-wide (count, canonical-occurrence) election per fingerprint,
# and an island-merge of the flagged windows into maximal spans —
# the suffix array never materializes.

_D8_L = 64

# Shared CTE chain: wins -> dup -> flag -> isl -> spans. DuckDB
# slices text[i : i+L-1] (1-based, inclusive end — same chars the
# Spark side assembles from the materialized char array).
_D8_CTES = f"""
wins AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(text[CAST(i AS INTEGER) : CAST(i + {_D8_L - 1} AS INTEGER)]) AS fp,
         doc_id * 4294967296 + i AS kk
  FROM (SELECT doc_id, text, unnest(range(1, length(text) - {_D8_L - 2})) AS i
        FROM documents)
),
dup AS (SELECT fp, MIN(kk) AS canon FROM wins GROUP BY fp HAVING COUNT(*) >= 2),
flag AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (fp) WHERE w.kk <> dup.canon),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos > prev + {_D8_L} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
  FROM (SELECT doc_id, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM flag)
),
spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_D8_L - 1} AS span_end,
         MAX(pos) + {_D8_L - 1} - MIN(pos) + 1 AS span_len,
         CAST(COUNT(*) AS BIGINT) AS n_wins
  FROM isl GROUP BY doc_id, island
)"""

_D8_SQL = f"""
WITH {_D8_CTES}
SELECT doc_id, span_start, span_end, span_len, n_wins
FROM spans ORDER BY doc_id, span_start
"""


@register("d8_substring_spans", oracle=_D8_SQL,
          doc="Exact-substring duplicate spans (Lee et al. 2022 "
              "arXiv:2107.06499): maximal repeated blocks of >= 64 chars "
              "per doc, canonical (globally first) occurrence exempt. One "
              "fp-keyed map-combinable count+min election, one fp join "
              "back, island merge under a doc-bounded window.",
          tags=("dedup", "text"))
def d8_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.dedup import substring_duplicate_spans

    d = table(spark, sf_dir, "documents")
    return substring_duplicate_spans(d, min_len=_D8_L).orderBy(
        "doc_id", "span_start"
    )


_PIPE10_SQL = f"""
WITH {_D8_CTES},
meta AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS orig_len
         FROM documents),
gaps AS (
  SELECT doc_id, COALESCE(prev_end, 0) + 1 AS gs, span_start - 1 AS ge
  FROM (SELECT doc_id, span_start,
               LAG(span_end) OVER (PARTITION BY doc_id ORDER BY span_start) AS prev_end
        FROM spans)
  WHERE span_start - 1 >= COALESCE(prev_end, 0) + 1
  UNION ALL
  SELECT s.doc_id, s.mx + 1 AS gs, m.orig_len AS ge
  FROM (SELECT doc_id, MAX(span_end) AS mx FROM spans GROUP BY doc_id) s
  JOIN meta m USING (doc_id) WHERE m.orig_len >= s.mx + 1
),
segs AS (
  SELECT g.doc_id, g.gs,
         m.text[CAST(g.gs AS INTEGER) : CAST(g.ge AS INTEGER)] AS seg
  FROM gaps g JOIN meta m USING (doc_id)
),
cleaned AS (SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS clean
            FROM segs GROUP BY doc_id),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(span_len) AS BIGINT) AS removed_chars
        FROM spans GROUP BY doc_id)
SELECT p.doc_id, m.orig_len, p.n_spans, p.removed_chars,
       md5(COALESCE(c.clean, '')) AS clean_fp
FROM per p JOIN meta m USING (doc_id) LEFT JOIN cleaned c USING (doc_id)
ORDER BY p.doc_id
"""


@register("pipe10_span_scrub", oracle=_PIPE10_SQL,
          doc="Exact-substring scrub: cut d8's duplicated spans out of "
              "each affected doc and rebuild it from the complement gaps "
              "(one canonical copy of every repeated block survives "
              "corpus-wide, unique surrounding text preserved). Oracle "
              "replays window election -> island merge -> gap rebuild in "
              "one spliced statement; clean_fp value-hashes the scrubbed "
              "text.",
          tags=("dedup", "text", "pipeline", "bench"))
def pipe10_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.dedup import (
        scrub_duplicate_spans,
        substring_duplicate_spans,
    )

    d = table(spark, sf_dir, "documents")
    spans = substring_duplicate_spans(d, min_len=_D8_L)
    return scrub_duplicate_spans(d, spans).orderBy("doc_id")


# --- DQ9: span-scrub governance audit ---------------------------------------
# The governance row for pipe10 (the dq4/dq6 discipline applied to
# block-granular dedup): per source, how many documents carry
# duplicated spans and what fraction of the source's bytes the scrub
# removes — the "which sources are boilerplate-heavy" table a
# curation review reads before trusting the scrubbed corpus (shared
# templates concentrate in specific crawls/sites, so removal is
# never mixture-neutral). Spliced from d8's proven CTE chain; one
# source-keyed aggregate over the span table joined back to the doc
# scan, |sources| rows out at any corpus size.

_DQ9_SQL = f"""
WITH {_D8_CTES},
per_doc AS (
  SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS removed
  FROM spans GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(p.removed) AS BIGINT) AS n_docs_affected,
       CAST(COALESCE(SUM(p.removed), 0) AS BIGINT) AS removed_chars,
       CAST(SUM(length(d.text)) AS BIGINT) AS src_chars,
       round(CAST(COALESCE(SUM(p.removed), 0) AS DOUBLE)
             / CAST(SUM(length(d.text)) AS DOUBLE), 6) AS removed_share
FROM documents d LEFT JOIN per_doc p USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


@register("dq9_span_audit", oracle=_DQ9_SQL,
          doc="Span-scrub governance: per-source affected-doc count and "
              "removed-byte share under d8's exact-substring spans — the "
              "boilerplate-concentration table read before trusting the "
              "scrubbed mixture. Spliced from d8's CTEs; one source-keyed "
              "aggregate, |sources| rows out.",
          tags=("dedup", "governance"))
def dq9_span_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.dedup import (
        substring_duplicate_spans,
    )

    d = table(spark, sf_dir, "documents")
    per_doc = (
        substring_duplicate_spans(d, min_len=_D8_L)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("removed"))
    )
    j = d.select(
        "doc_id", "source", F.length("text").cast("long").alias("n")
    ).join(per_doc, "doc_id", "left")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("removed").alias("n_docs_affected"),
            F.coalesce(F.sum("removed"), F.lit(0)).alias("removed_chars"),
            F.sum("n").alias("src_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_docs_affected",
            "removed_chars",
            F.col("src_chars"),
            F.round(
                F.col("removed_chars").cast("double")
                / F.col("src_chars").cast("double"),
                6,
            ).alias("removed_share"),
        )
        .orderBy("source")
    )


# --- PIPE10i: incremental span scrub (batch vs corpus) ----------------------
# The ingestion form of pipe10 (pipe5's discipline applied to block-
# granular dedup): the incoming batch (doc_id % 5 == 0) is scrubbed
# against the existing corpus's window-fingerprint artifact — the
# corpus is ALWAYS canonical (ingestion order outranks doc_id; the
# deliberate divergence from d8's global (doc, pos) election), and
# batch-internal repeats keep their batch-canonical copy. Work per
# drain is batch windows + one fp-keyed semi join against the stored
# DISTINCT-fp table, never a corpus re-election.

_PIPE10I_SQL = f"""
WITH wins AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(text[CAST(i AS INTEGER) : CAST(i + {_D8_L - 1} AS INTEGER)]) AS fp,
         doc_id * 4294967296 + i AS kk
  FROM (SELECT doc_id, text, unnest(range(1, length(text) - {_D8_L - 2})) AS i
        FROM documents)
),
bw AS (SELECT * FROM wins WHERE doc_id % 5 = 0),
cfp AS (SELECT DISTINCT fp FROM wins WHERE doc_id % 5 != 0),
bdup AS (SELECT fp, MIN(kk) AS canon FROM bw GROUP BY fp HAVING COUNT(*) >= 2),
flag AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT b.doc_id, b.pos FROM bw b JOIN cfp USING (fp)
    UNION ALL
    SELECT b.doc_id, b.pos FROM bw b JOIN bdup USING (fp)
    WHERE b.kk <> bdup.canon
  )
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos > prev + {_D8_L} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
  FROM (SELECT doc_id, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM flag)
),
spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_D8_L - 1} AS span_end,
         MAX(pos) + {_D8_L - 1} - MIN(pos) + 1 AS span_len
  FROM isl GROUP BY doc_id, island
),
meta AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS orig_len
         FROM documents WHERE doc_id % 5 = 0),
gaps AS (
  SELECT doc_id, COALESCE(prev_end, 0) + 1 AS gs, span_start - 1 AS ge
  FROM (SELECT doc_id, span_start,
               LAG(span_end) OVER (PARTITION BY doc_id ORDER BY span_start) AS prev_end
        FROM spans)
  WHERE span_start - 1 >= COALESCE(prev_end, 0) + 1
  UNION ALL
  SELECT s.doc_id, s.mx + 1 AS gs, m.orig_len AS ge
  FROM (SELECT doc_id, MAX(span_end) AS mx FROM spans GROUP BY doc_id) s
  JOIN meta m USING (doc_id) WHERE m.orig_len >= s.mx + 1
),
segs AS (
  SELECT g.doc_id, g.gs,
         m.text[CAST(g.gs AS INTEGER) : CAST(g.ge AS INTEGER)] AS seg
  FROM gaps g JOIN meta m USING (doc_id)
),
cleaned AS (SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS clean
            FROM segs GROUP BY doc_id),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(span_len) AS BIGINT) AS removed_chars
        FROM spans GROUP BY doc_id)
SELECT p.doc_id, m.orig_len, p.n_spans, p.removed_chars,
       md5(COALESCE(c.clean, '')) AS clean_fp
FROM per p JOIN meta m USING (doc_id) LEFT JOIN cleaned c USING (doc_id)
ORDER BY p.doc_id
"""


@register("pipe10i_incremental_span_scrub", oracle=_PIPE10I_SQL,
          doc="Incremental exact-substring scrub: the incoming batch's "
              "windows flagged against the corpus DISTINCT-fp artifact "
              "(corpus always canonical — ingestion order outranks "
              "doc_id) plus batch-internal election, island-merged and "
              "gap-rebuilt; work per drain is batch windows + one "
              "fp-keyed semi join, never a corpus re-election.",
          tags=("dedup", "text", "pipeline"))
def pipe10i_incremental_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.dedup import (
        incremental_span_flags,
        merge_window_islands,
        scrub_duplicate_spans,
        substring_windows,
    )

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    cfp = substring_windows(corpus, min_len=_D8_L).select("fp").distinct()
    flagged = incremental_span_flags(batch, cfp, min_len=_D8_L)
    spans = merge_window_islands(flagged, min_len=_D8_L)
    return scrub_duplicate_spans(batch, spans).orderBy("doc_id")
