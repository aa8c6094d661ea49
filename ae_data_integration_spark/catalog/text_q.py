"""Text-analysis queries over the documents table.

Training-data-pipeline operators (language ID, quality scoring,
token counting) — all JVM-side regex/array HOFs; the DuckDB oracles
replicate the identical token pipeline, so values are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    lang_marker_table,
    mean_word_len,
    punct_ratio,
    quality_score,
    token_count,
    tokens,
)
from ae_data_integration_spark.tables import table

# DuckDB token pipeline identical to functions.text.tokens()
_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


# --- T1: token statistics ----------------------------------------------------

_T1_SQL = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       list_reduce(list_transform({_TOKS}, w -> CAST(length(w) AS DOUBLE)), (a,b) -> a+b)
         / CAST(greatest(len({_TOKS}), 1) AS DOUBLE) AS mean_word_len,
       CAST(length(text) - length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g')) AS DOUBLE)
         / greatest(length(text), 1) AS punct_ratio,
       list_reduce(list_transform(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''),
                                  w -> CAST(ceil(length(w) / 4.0) AS DOUBLE)), (a,b) -> a+b)
         + CAST(length(text) - length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g')) AS DOUBLE)
         AS bpe_tokens
FROM documents
ORDER BY doc_id
"""


@register("t1_token_stats", oracle=_T1_SQL,
          doc="Tokenization, mean word length, punctuation ratio, BPE-ish count.",
          tags=("text",))
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        mean_word_len("text").alias("mean_word_len"),
        punct_ratio("text").alias("punct_ratio"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    ).orderBy("doc_id")


# --- T2: composite quality score ---------------------------------------------

_T2_SQL = f"""
SELECT doc_id,
  (least(CAST(len({_TOKS}) AS DOUBLE) / 64.0, 1.0)
   + CASE WHEN (list_reduce(list_transform({_TOKS}, w -> CAST(length(w) AS DOUBLE)), (a,b) -> a+b)
                / CAST(greatest(len({_TOKS}), 1) AS DOUBLE)) >= 2.0
           AND (list_reduce(list_transform({_TOKS}, w -> CAST(length(w) AS DOUBLE)), (a,b) -> a+b)
                / CAST(greatest(len({_TOKS}), 1) AS DOUBLE)) <= 12.0
          THEN 1.0 ELSE 0.0 END
   + (1.0 - least((CAST(length(text) - length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1)) * 4.0, 1.0))
  ) / 3.0 AS quality
FROM documents
ORDER BY doc_id
"""


@register("t2_quality_score", oracle=_T2_SQL,
          doc="Heuristic doc-quality score (length/word-shape/punct density).",
          tags=("text",))
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality")).orderBy("doc_id")


# --- T3: language ID by marker-word vote -------------------------------------

def _markers_values_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in LANG_MARKERS.items() for w in ws
    )
    return f"(VALUES {rows}) AS m(lang_pred, marker)"


_T3_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang_pred, COUNT(*) AS n_hits
  FROM tok t JOIN {_markers_values_sql()} ON t.tok = m.marker
  GROUP BY t.doc_id, m.lang_pred
)
SELECT doc_id, lang_pred, n_hits FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lang_pred) AS rk
  FROM hits
) WHERE rk = 1
ORDER BY doc_id
"""


@register("t3_lang_id", oracle=_T3_SQL,
          doc="Language ID: broadcast marker-dim join + majority vote "
              "(same pattern as ref Data_prep.py:86-89 label dict).",
          tags=("text",))
def t3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    hits = (
        tok.join(F.broadcast(lang_marker_table(spark)), tok.tok == F.col("marker"))
        .groupBy("doc_id", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), "lang_pred")
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang_pred", "n_hits")
        .orderBy("doc_id")
    )


# --- T4: rolling-hash document fingerprint ----------------------------------

from ae_data_integration_spark.functions.hashing import MINHASH_P
from ae_data_integration_spark.functions.text import ROLL_B, rolling_fingerprint

_T4_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       (CASE WHEN len(t) = 0 THEN 0 ELSE
         list_reduce(
           list_transform(t, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)),
           (acc, h) -> (acc * {ROLL_B} + h) % {MINHASH_P})
       END) % {MINHASH_P} AS fingerprint
FROM tok
ORDER BY doc_id
"""


@register("t4_fingerprint", oracle=_T4_SQL,
          doc="Rabin-Karp rolling-hash document fingerprint: order-sensitive "
              "left fold of (h*B + md5_48(token)) mod P — per-row, zero "
              "shuffle, integer-exact across engines.",
          tags=("text",))
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import token_count

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        rolling_fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


# --- T5: corpus-level top-k n-grams by document frequency -------------------
# The corpus-statistics op a curation pipeline uses to spot template
# boilerplate (an n-gram present in many documents). Distinct-per-doc
# n-grams (the d5 dedup unit) -> explode -> count = document
# frequency -> global top-k as a TakeOrdered (per-partition top-k +
# driver merge of k rows, never a single-partition window sort — the
# counts relation is vocabulary-sized and must not funnel through one
# task at corpus scale). Ties break (df DESC, ngram ASC) on both
# engines, so the row set is deterministic.

_T5_WNG = (
    "CASE WHEN len({t}) >= 3 THEN "
    "list_distinct(list_transform(range(1, len({t}) - 1), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2])) "
    "ELSE [array_to_string({t}, ' ')] END"
)

_T5_SQL = f"""
WITH tok AS (SELECT {_TOKS} AS t FROM documents),
g AS (SELECT unnest({_T5_WNG.format(t='t')}) AS ngram FROM tok),
c AS (SELECT ngram, COUNT(*) AS df FROM g GROUP BY ngram)
SELECT ngram, df FROM c ORDER BY df DESC, ngram LIMIT 20
"""


@register("t5_topk_ngrams", oracle=_T5_SQL,
          doc="Top-20 word-3-grams by document frequency (boilerplate "
              "detector): distinct-per-doc ngrams -> count -> TakeOrdered "
              "top-k, deterministic tie-break.",
          tags=("text", "bench"))
def t5_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import (
        tokens,
        word_ngrams_from_tokens,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select(tokens("text").alias("t"))
    grams = toks.select(
        F.explode(word_ngrams_from_tokens("t", 3)).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))
    return counts.orderBy(F.desc("df"), "ngram").limit(20)


# --- T6: intra-document repetition score ------------------------------------
# The Gopher/C4-style repetition filter: fraction of a document's
# overlapping word-3-grams that are duplicates of an earlier one.
# High ratio = templated/boilerplate text. Per-row array arithmetic,
# zero shuffle — at 100 TB this is a pure map stage.

_T6_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"
_T6_WNG = (
    "CASE WHEN len(t) >= 3 THEN "
    "list_distinct(list_transform(range(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) "
    "ELSE [array_to_string(t, ' ')] END"
)

_T6_SQL = f"""
WITH tok AS (SELECT doc_id, {_T6_TOKS} AS t FROM documents)
SELECT doc_id,
       CAST(greatest(len(t) - 2, 1) AS BIGINT) AS n_ngrams,
       CAST(len({_T6_WNG}) AS BIGINT) AS n_distinct,
       1.0 - CAST(len({_T6_WNG}) AS DOUBLE)
             / CAST(greatest(len(t) - 2, 1) AS DOUBLE) AS rep_ratio
FROM tok
ORDER BY doc_id
"""


@register("t6_repetition", oracle=_T6_SQL,
          doc="Intra-document repetition: overlapping word-3-gram count vs "
              "distinct count, rep_ratio = duplicate fraction (the C4/Gopher "
              "boilerplate signal). Per-row array ops, zero shuffle.",
          tags=("text", "bench"))
def t6_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import word_ngrams_from_tokens

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens("text").alias("t"))
    total = F.greatest(F.size("t") - F.lit(2), F.lit(1)).cast("long")
    distinct = F.size(word_ngrams_from_tokens("t", 3)).cast("long")
    return tok.select(
        "doc_id",
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        (
            F.lit(1.0) - distinct.cast("double") / total.cast("double")
        ).alias("rep_ratio"),
    ).orderBy("doc_id")


# --- T7/T8: chunking + sequence packing (LLM data-prep stages) --------------

_T7_CHUNK, _T7_OVER = 32, 8
_T7_STRIDE = _T7_CHUNK - _T7_OVER

_T7_BASE = f"""WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS t
  FROM documents
),
nc AS (
  SELECT doc_id, t,
         greatest((len(t) - {_T7_OVER} + {_T7_STRIDE - 1}) // {_T7_STRIDE}, 1) AS n_chunks
  FROM tok
),
ch AS (
  SELECT doc_id, i.i AS chunk_id,
         CAST(len(t[i.i * {_T7_STRIDE} + 1 : i.i * {_T7_STRIDE} + {_T7_CHUNK}]) AS BIGINT) AS n_tokens,
         md5(array_to_string(t[i.i * {_T7_STRIDE} + 1 : i.i * {_T7_STRIDE} + {_T7_CHUNK}], ' ')) AS chunk_hash
  FROM nc, LATERAL (SELECT unnest(range(0, nc.n_chunks)) AS i) i
)"""

_T7_SQL = _T7_BASE + """
SELECT doc_id, chunk_id, n_tokens, chunk_hash FROM ch
ORDER BY doc_id, chunk_id
"""


@register("t7_chunking", oracle=_T7_SQL,
          doc="Sliding-window token chunking (chunk=32, overlap=8): per-row "
              "array slices + generator explode, zero shuffle — the "
              "tokenize-and-chunk stage of LLM data prep. chunk_hash "
              "fingerprints each chunk's content.",
          tags=("text", "chunking"))
def t7_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.chunking import chunk_tokens

    d = table(spark, sf_dir, "documents")
    return chunk_tokens(d, "doc_id", "text", chunk=_T7_CHUNK, overlap=_T7_OVER).orderBy(
        "doc_id", "chunk_id"
    )


_T8_CTX, _T8_SHARDS = 512, 16

_T8_SQL = _T7_BASE + f""",
sh AS (
  SELECT *,
         CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
           % {_T8_SHARDS} AS shard
  FROM ch
),
binned AS (
  SELECT shard, doc_id, chunk_id, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
           // {_T8_CTX} AS BIGINT) AS bin
  FROM sh
)
SELECT shard, bin, COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / {_T8_CTX}.0 AS fill
FROM binned GROUP BY shard, bin
ORDER BY shard, bin
"""


@register("t8_packing", oracle=_T8_SQL,
          doc="Sequence packing: chunks pack into ctx=512 bins by running "
              "token count WITHIN md5-derived shards (a global packing "
              "order would be one giant window — the shard layout is what "
              "a distributed packer actually uses). One key shuffle; "
              "integer-exact cross-engine.",
          tags=("text", "chunking"))
def t8_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.chunking import chunk_tokens, pack_chunks

    d = table(spark, sf_dir, "documents")
    ch = chunk_tokens(d, "doc_id", "text", chunk=_T7_CHUNK, overlap=_T7_OVER)
    return pack_chunks(ch, "doc_id", ctx=_T8_CTX, n_shards=_T8_SHARDS).orderBy(
        "shard", "bin"
    )


# --- T9: distinctive terms per document (TF-IDF-shaped, integer-exact) ------
# Rank each document's terms by (term frequency DESC, document
# frequency ASC, term) — the TF-IDF ordering without the log(): the
# idf log is monotone in df, so ranking by df directly gives the
# same per-doc ordering while staying integer/string-exact
# cross-engine (Java Math.log vs libm differ in the last ulp).

_T9_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rk
  FROM tf JOIN df ON tf.term = df.term
)
SELECT doc_id, term, tf, df, rk FROM ranked WHERE rk <= 3
ORDER BY doc_id, rk
"""


@register("t9_distinctive_terms", oracle=_T9_SQL,
          doc="Top-3 distinctive terms per document: rank by (tf DESC, "
              "df ASC, term) — the TF-IDF ordering with the monotone log "
              "dropped, so it stays integer-exact. One explode + two "
              "partial-agg shuffles + a per-doc top-k window.",
          tags=("text",))
def t9_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", F.col("rk").cast("long").alias("rk"))
        .orderBy("doc_id", "rk")
    )


# --- T10: inverted index (term -> posting list) -----------------------------
# The search-engine primitive: per term, document frequency and the
# sorted posting list (fingerprinted with md5 so the compare stays
# scalar; the list itself is array_join of sorted doc ids). Capped to
# terms with df >= 5 — at 100 TB the long tail is partition-local and
# this query's shuffle carries only (term, doc_id) pairs.

_T10_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS term
  FROM documents
),
p AS (
  SELECT term, COUNT(*) AS df,
         md5(array_to_string(list_sort(array_agg(doc_id)), ',')) AS postings_fp,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
  FROM tok GROUP BY term
)
SELECT term, df, postings_fp, first_doc, last_doc
FROM p WHERE df >= 5
ORDER BY term
"""


@register("t10_inverted_index", oracle=_T10_SQL,
          doc="Inverted index: per term the document frequency and the "
              "sorted posting list (md5-fingerprinted for scalar compare). "
              "One distinct + one groupBy shuffle of (term, doc_id) pairs.",
          tags=("text",))
def t10_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term")).distinct()
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.md5(
                F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
            ).alias("postings_fp"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("df") >= 5)
        .orderBy("term")
    )


# --- T11: benchmark decontamination -----------------------------------------
# The training-data hygiene step every LLM pipeline runs: flag corpus
# documents sharing word-n-grams with the eval/benchmark set. The
# synthetic corpus's 'src0' slice plays the benchmark; n=3 is sized to
# its short texts (production uses 8..13 — a knob on the operator).
# Scale shape in functions/text.contamination_hits: the benchmark
# n-gram set broadcasts, the corpus side is map + broadcast semi join
# + one combinable count — no corpus-sized shuffle.

_T11_SQL = f"""
WITH tok AS (SELECT doc_id, source, {_T6_TOKS} AS t FROM documents),
g AS (SELECT doc_id, source, unnest({_T6_WNG}) AS ngram FROM tok),
ev AS (SELECT DISTINCT ngram FROM g WHERE source = 'src0'),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_overlapping
  FROM g JOIN ev USING (ngram)
  WHERE g.source != 'src0'
  GROUP BY g.doc_id
)
SELECT doc_id, n_overlapping FROM hits ORDER BY doc_id
"""


@register("t11_decontaminate", oracle=_T11_SQL,
          doc="Benchmark decontamination: corpus documents sharing any "
              "word-3-gram with the eval slice (source='src0'), with the "
              "per-doc overlapping-ngram count — broadcast the benchmark "
              "ngram set, semi-join the corpus, one combinable count; the "
              "training keep-list is an anti-join against this result.",
          tags=("text", "dedup", "bench"))
def t11_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.text import contamination_hits

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src0")
    eval_docs = d.filter(F.col("source") == "src0")
    return contamination_hits(corpus, eval_docs, "doc_id", "text", n=3).orderBy(
        "doc_id"
    )


# --- T12: domain-mixing weights ---------------------------------------------
# Data-mixture planning: per-source token mass -> temperature-scaled
# sampling weights w_s = n_s^alpha / sum(n^alpha) (alpha = 0.5 keeps
# the power an EXACT IEEE sqrt; the normalizing sum goes through the
# fixed-point grid so the 20-term reduction is order-independent).
# The shuffle carries one row per source — map-side combined.

from ae_data_integration_spark.functions.portable import Q30, fpsum_sql  # noqa: E402
from ae_data_integration_spark.functions.portable import fpsum  # noqa: E402

_T12_SQL = f"""
WITH per_doc AS (SELECT source, len({_TOKS}) AS n FROM documents),
per_src AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
         sqrt(CAST(SUM(n) AS DOUBLE)) AS r
  FROM per_doc GROUP BY source
),
tot AS (SELECT {fpsum_sql('r', Q30)} AS z FROM per_src)
SELECT source, n_docs, n_tokens,
       round(r / z, 6) AS mix_weight
FROM per_src CROSS JOIN tot
ORDER BY source
"""


@register("t12_mixture_weights", oracle=_T12_SQL,
          doc="Domain-mixing weights for corpus sampling: per-source doc/"
              "token counts and temperature-scaled weight "
              "sqrt(tokens)/sum(sqrt(tokens)) (alpha=0.5 keeps the power "
              "IEEE-exact; normalizer fixed-point). One combinable "
              "source-key aggregate.",
          tags=("text", "pipeline"))
def t12_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_src = (
        d.select("source", token_count("text").alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
        )
        .withColumn("r", F.sqrt(F.col("n_tokens").cast("double")))
    )
    tot = per_src.agg(fpsum("r", Q30).alias("z"))
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("r") / F.col("z"), 6).alias("mix_weight"),
        )
        .orderBy("source")
    )


# --- T13: length-bucketed batch planning ------------------------------------
# Sequence-length histogram over power-of-two-ish buckets — the shape
# a batch planner packs against. Explicit integer boundaries (no
# float log2), so the bucketing is exact on any engine.

_T13_BOUNDS = (16, 32, 64, 128, 256)


def _bucket_case_sql() -> str:
    arms = " ".join(
        f"WHEN n <= {b} THEN {i}" for i, b in enumerate(_T13_BOUNDS)
    )
    return f"CASE {arms} ELSE {len(_T13_BOUNDS)} END"


_T13_SQL = f"""
WITH per_doc AS (SELECT len({_TOKS}) AS n FROM documents),
b AS (SELECT {_bucket_case_sql()} AS bucket, n FROM per_doc)
SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(MIN(n) AS BIGINT) AS min_len, CAST(MAX(n) AS BIGINT) AS max_len
FROM b GROUP BY bucket ORDER BY bucket
"""


@register("t13_length_buckets", oracle=_T13_SQL,
          doc="Token-length histogram over fixed power-of-two buckets "
              "(<=16, <=32, ... , >256) with per-bucket token mass and "
              "min/max — the batch-shape planning input for sequence "
              "packing; integer-exact, one combinable aggregate.",
          tags=("text", "chunking"))
def t13_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n = token_count("text")
    bucket = F.lit(len(_T13_BOUNDS))
    for i in range(len(_T13_BOUNDS) - 1, -1, -1):
        bucket = F.when(n <= _T13_BOUNDS[i], F.lit(i)).otherwise(bucket)
    per = d.select(bucket.cast("int").alias("bucket"), n.alias("n"))
    return (
        per.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("n").cast("long").alias("min_len"),
            F.max("n").cast("long").alias("max_len"),
        )
        .orderBy("bucket")
    )


# --- SAMP1: deterministic stratified corpus sample --------------------------
# The md5-ranked per-stratum top-k: a seeded, partition-independent
# "random" sample of k docs per language — the portable analogue of
# df.groupby(lang).sample(k) that any engine replays exactly.

_SAMP1_K = 3

_SAMP1_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5('smp' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT lang, doc_id, rk FROM ranked WHERE rk <= {_SAMP1_K}
ORDER BY lang, rk
"""


@register("samp1_stratified_sample", oracle=_SAMP1_SQL,
          doc="Deterministic stratified sample: md5-ranked top-3 documents "
              "per language (seeded 'random' choice both engines replay "
              "bit-exactly; SURVEY §4.2a discipline). One lang-key window "
              "over rank-pruned rows.",
          tags=("text", "sampling"))
def samp1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.hashing import md5_rank

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(md5_rank("doc_id", "smp"), "doc_id")
    return (
        d.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= _SAMP1_K)
        .orderBy("lang", "rk")
    )


# --- t14: BM25 top-k retrieval ----------------------------------------------
# The classic lexical retrieval scorer over the documents corpus —
# the quality/retrieval tool every training-data pipeline carries
# (dedup against eval sets, nearest-neighbor mining, curriculum
# scoring). Okapi BM25 (k1=1.2, b=0.75) for a fixed query term set;
# idf = ln(1 + (N - df + 0.5)/(df + 0.5)). Per-term partial scores
# are Q30-quantized before the per-doc sum, so the total is
# term-order- and partition-independent; ranking is (score DESC,
# doc_id) for a stable top-15. Scale shape: one token shuffle for
# (doc, term) tf over the 3 query terms only (the isin filter pushes
# into the explode), df/N/avgdl are model-sized broadcasts.

_T14_TERMS = ("join", "stream", "window")
_T14_K1, _T14_B = 1.2, 0.75

# The WITH...scored prefix is shared with s4_hybrid_rrf
# (catalog/similarity_q.py), which fuses this lexical ranking with a
# cosine leg — keep the CTE text in ONE place so both oracles replay
# the identical BM25.
BM25_SCORED_CTES = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
  FROM documents
),
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl FROM lens),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(t) AS term FROM toks
  ) WHERE term IN ('join', 'stream', 'window')
  GROUP BY doc_id, term
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         (SUM(CAST(round(
            (ln(1 + (n - df + 0.5) / (df + 0.5))
             * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / n))))))
            * 1073741824) AS BIGINT)) / 1073741824.0) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)"""

_T14_SQL = f"""{BM25_SCORED_CTES}
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 15
"""


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) BM25 relevance for the fixed _T14_TERMS query —
    the un-ranked scored set t14 tops and s4_hybrid_rrf fuses. Twin of
    BM25_SCORED_CTES' final `scored` CTE."""
    from ae_data_integration_spark.functions.text import tokens

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    lens = toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_T14_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sdl").cast("double") / F.col("n")
    idf = F.log(F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = idf * (
        (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(_T14_K1)
            * (F.lit(0.25) + F.lit(_T14_B) * (F.col("dl").cast("double") / avgdl))
        )
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            (F.sum(F.round(w * F.lit(Q30)).cast("long")) / F.lit(float(Q30)))
            .alias("score")
        )
    )
    return scored


@register("t14_bm25_topk", oracle=_T14_SQL,
          doc="Okapi BM25 top-15 for a fixed query term set (k1=1.2, "
              "b=0.75): tf from one filtered token explode, df/N/avgdl "
              "as broadcast model-sized aggregates, per-term partials "
              "Q30-quantized so the per-doc sum is order-independent.",
          tags=("text", "retrieval"))
def t14_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scored(spark, sf_dir).orderBy(F.desc("score"), "doc_id").limit(15)


# --- T15: duplicated-span detection via content-defined anchors -------------
# Span-level exact-substring duplication — the dedup signal MinHash
# misses (two long documents sharing one long quoted passage have low
# SET Jaccard but high span duplication; pretraining pipelines filter
# or trim such spans). Suffix arrays are the offline gold standard;
# the distributed form here is winnowing-style CONTENT-DEFINED
# anchors: hash every overlapping 8-token window (stride 1), keep the
# windows whose 48-bit md5 is ≡ 0 (mod 8) — a deterministic ~1/8
# sample whose selection depends only on the window CONTENT, so the
# same duplicated passage selects the same anchors in every document
# regardless of alignment/offset (a fixed-stride sample would miss
# misaligned copies). A doc's duplication score = fraction of its
# distinct anchors that appear in ≥ 2 documents.
# Scale shape: per-row window hashing (map, zero shuffle), one
# (anchor-hash) groupBy with map-side partials, one join back on the
# ~N/8-row anchor table. No pair joins, no quadratic term.

_T15_W = 8       # window width in tokens
_T15_MOD = 8     # anchor selectivity: keep h % 8 == 0

_T15_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"

_T15_SQL = f"""
WITH tok AS (SELECT doc_id, {_T15_TOKS} AS t FROM documents),
anch AS (
  SELECT doc_id,
         list_distinct(list_filter(
           list_transform(range(1, greatest(len(t) - {_T15_W - 1}, 0) + 1),
                          i -> CAST(('0x' || substr(md5(array_to_string(t[i : i + {_T15_W - 1}], ' ')), 1, 12)) AS BIGINT)),
           h -> h % {_T15_MOD} = 0)) AS ahs
  FROM tok
),
ex AS (SELECT doc_id, unnest(ahs) AS h FROM anch),
dfh AS (SELECT h, COUNT(*) AS n_docs FROM ex GROUP BY h),
dup AS (
  SELECT e.doc_id, COUNT(*) AS n_dup FROM ex e
  JOIN dfh ON e.h = dfh.h WHERE dfh.n_docs > 1 GROUP BY e.doc_id
)
SELECT a.doc_id,
       CAST(len(a.ahs) AS BIGINT) AS n_anchors,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_anchors,
       CASE WHEN len(a.ahs) > 0
            THEN CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / CAST(len(a.ahs) AS DOUBLE)
            ELSE 0.0 END AS dup_anchor_frac
FROM anch a LEFT JOIN dup d ON a.doc_id = d.doc_id
ORDER BY a.doc_id
"""


@register("t15_dup_spans", oracle=_T15_SQL,
          doc="Span-level duplication score via content-defined anchors: "
              "every overlapping 8-token window hashed (48-bit md5), "
              "windows with h % 8 == 0 kept as alignment-independent "
              "anchors; per doc, the fraction of distinct anchors shared "
              "with >= 1 other document. One map stage + one anchor-hash "
              "groupBy + one join back — no pair joins.",
          tags=("text", "dedup", "bench"))
def t15_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.caching import persist_tracked
    from ae_data_integration_spark.functions.text import tokens

    d = table(spark, sf_dir, "documents")
    # tokens land in their own projection (HOF lambdas get no CSE)
    tok = d.select("doc_id", tokens("text").alias("t"))
    par = spark.sparkContext.defaultParallelism
    if tok.rdd.getNumPartitions() < par:
        tok = tok.repartition(par, "doc_id")
    win = F.transform(
        F.sequence(F.lit(1), F.size("t") - F.lit(_T15_W - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(F.col("t"), i, _T15_W), " ")), 1, 12
            ),
            16,
            10,
        ).cast("long"),
    )
    anch = persist_tracked(tok.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.when(F.size("t") >= _T15_W, win)
                .otherwise(F.array().cast("array<bigint>")),
                lambda h: h % _T15_MOD == 0,
            )
        ).alias("ahs"),
    ))
    # tracked persist: anch feeds THREE consumers (the anchor-df
    # groupBy, the dup join's explode, and the final per-doc join) —
    # uncached, the tokenize+window-hash lineage ran three times
    # (measured 3x the query wall at sf0.1).
    ex = anch.select("doc_id", F.explode("ahs").alias("h"))
    dfh = ex.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = (
        ex.join(dfh.filter(F.col("n_docs") > 1), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0)).cast("long")
    return (
        anch.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ahs").cast("long").alias("n_anchors"),
            n_dup.alias("n_dup_anchors"),
            F.when(
                F.size("ahs") > 0,
                n_dup.cast("double") / F.size("ahs").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_anchor_frac"),
        )
        .orderBy("doc_id")
    )


# --- T16: hashed-feature linear classifier (fastText-style scoring) ---------
# The scoring half of a fastText / linear quality-or-language
# classifier, the way a 100-TB curation run deploys one: each token
# hashes into B buckets (feature hashing, no vocabulary to ship),
# per-doc bucket counts join a BROADCAST (classes x B) weight table,
# and the class score is the integer dot product argmax. Weights here
# are md5-derived stand-ins for trained parameters — the plumbing
# (hash -> count -> broadcast join -> argmax) is exactly what serving
# a real weight table looks like, and it keeps the oracle exact:
# counts and the centered 48-bit weights are integers, so scores are
# bit-equal BIGINTs on both engines with no quantization step.
# Scale: one token explode + one (doc, bucket) groupBy; the weight
# join is broadcast (classes x B rows); argmax is a per-doc window
# over `classes` rows. No shuffle grows with vocabulary.

_T16_B = 64
_T16_LANGS = ("de", "en", "es", "fr", "zh")
_T16_CENTER = 1 << 47

_T16_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
cnts AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) % {_T16_B} AS bucket,
         COUNT(*) AS cnt
  FROM tok GROUP BY doc_id, bucket
),
w AS (
  SELECT l.lang, b.bucket,
         CAST(('0x' || substr(md5('lc' || l.lang || ':' || CAST(b.bucket AS VARCHAR)), 1, 12)) AS BIGINT)
           - {_T16_CENTER} AS w
  FROM (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')) l(lang),
       (SELECT unnest(range(0, {_T16_B})) AS bucket) b
),
s AS (
  SELECT c.doc_id, w.lang, CAST(SUM(c.cnt * w.w) AS BIGINT) AS score_q
  FROM cnts c JOIN w ON c.bucket = w.bucket
  GROUP BY c.doc_id, w.lang
)
SELECT doc_id, lang AS pred_class, score_q FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_q DESC, lang) AS rk
  FROM s
) WHERE rk = 1
ORDER BY doc_id
"""


@register("t16_hashed_classifier", oracle=_T16_SQL,
          doc="Feature-hashing linear classifier scoring: token -> md5 "
              "bucket (B=64) counts, broadcast (class x bucket) integer "
              "weight table, per-doc argmax. md5 weights stand in for "
              "trained parameters; serving plumbing is the operator.",
          tags=("text", "bench"))
def t16_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
        % F.lit(_T16_B)
    )
    cnts = (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    langs = spark.createDataFrame([(l,) for l in _T16_LANGS], "lang string")
    w = (
        langs.crossJoin(spark.range(_T16_B).withColumnRenamed("id", "bucket"))
        .withColumn(
            "w",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lc"), F.col("lang"), F.lit(":"),
                            F.col("bucket").cast("string"),
                        )
                    ), 1, 12,
                ), 16, 10,
            ).cast("long")
            - F.lit(_T16_CENTER),
        )
    )
    s = (
        cnts.join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("score_q"))
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), "lang")
    return (
        s.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("lang").alias("pred_class"), "score_q")
        .orderBy("doc_id")
    )


# --- T17: BPE-style pair-frequency counting (vocab induction step) ----------
# The distributed primitive inside byte-pair-encoding tokenizer
# training: count adjacent character-pair frequencies over the
# corpus and rank candidate merges. The scale-critical move is to
# aggregate the VOCABULARY first (token -> corpus count: one token
# shuffle whose key cardinality is the vocab, not the corpus) and
# explode pairs over distinct tokens weighted by their counts —
# pair work is O(vocab x token_len) however many times each token
# repeats, which at 100 TB is the difference between a vocab-sized
# job and re-scanning every byte per merge round. Real BPE iterates
# merge -> recount; each round is exactly this shape.

_T17_TOPK = 30

_T17_SQL = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
vocab AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
pairs AS (
  SELECT unnest(list_transform(range(1, length(tok)), i -> substr(tok, i, 2))) AS pair, n
  FROM vocab
)
SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {_T17_TOPK}
"""


@register("t17_bpe_pair_counts", oracle=_T17_SQL,
          doc="BPE merge-candidate counting: adjacent char-pair frequencies "
              "aggregated over the token VOCABULARY (counts as weights), "
              "top-30 merges — one vocab-keyed shuffle, pair explode over "
              "distinct tokens only.",
          tags=("text",))
def t17_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    pair_arr = F.when(
        F.length("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("tok") - 1),
            lambda i: F.substr(F.col("tok"), i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = vocab.select(F.explode(pair_arr).alias("pair"), "n")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(_T17_TOPK)
    )


# --- SAMP2: weighted corpus sampling (exponential keys) ---------------------
# Weighted sampling without replacement, the distributed way
# (Efraimidis-Spirakis A-ES): each doc draws u = md5-uniform(0,1]
# and gets key -ln(u)/w; the n smallest keys are the sample, with
# inclusion probability proportional to w (here w = n_chars: sample
# mass follows document size, the shape mixture-weight resampling
# uses). One scan + one TakeOrdered top-n — no shuffle of the corpus,
# partition-independent, and every engine replays the md5 draw. The
# ln() is not IEEE-correctly-rounded, so keys are Q30-quantized
# before ranking (same discipline as BM25's idf partials);
# quantized keys are bit-equal cross-engine, ties broken by doc_id.

_SAMP2_N = 50
_SAMP2_DENOM = 281474976710656.0  # 2^48

_SAMP2_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(round(
           (-ln((CAST(('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
                / {_SAMP2_DENOM})
            / CAST(n_chars AS DOUBLE)) * {Q30}
         ) AS BIGINT) AS key_q
  FROM documents
)
SELECT doc_id, n_chars, key_q
FROM keyed
ORDER BY key_q, doc_id
LIMIT {_SAMP2_N}
"""


@register("samp2_weighted_sample", oracle=_SAMP2_SQL,
          doc="Weighted sampling without replacement (Efraimidis-Spirakis "
              "exponential keys, w = n_chars): md5-uniform draw, "
              "-ln(u)/w Q30-quantized, smallest-50 TakeOrdered.",
          tags=("text", "sampling"))
def samp2_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws"), F.col("doc_id").cast("string"))), 1, 12
            ), 16, 10,
        ).cast("long")
        + 1
    ) / F.lit(_SAMP2_DENOM)
    key = -F.log(u) / F.col("n_chars").cast("double")
    return (
        d.select(
            "doc_id", "n_chars",
            F.round(key * F.lit(Q30)).cast("long").alias("key_q"),
        )
        .orderBy("key_q", "doc_id")
        .limit(_SAMP2_N)
    )


# --- T18: PII scrubbing -------------------------------------------------------

# Redaction patterns chained in a fixed order (email before digit-run
# so an address's digits don't get split). Java regex and RE2 agree
# on this subset (char classes, bounded/unbounded repetition — no
# backrefs, no lookaround). Applied to customer names, where the
# long digit runs actually fire; email/IPv4 hit zero rows here but
# exercise the full chain on both engines.
_PII_PATTERNS = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "[IP]"),
    (r"[0-9]{6,}", "[ID]"),
)


def _pii_sql_expr(col: str) -> str:
    expr = col
    for pat, repl in _PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


_T18_SQL = f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {_pii_sql_expr('c_name')} <> c_name THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redacted,
       CAST(SUM(length(c_name) - length({_pii_sql_expr('c_name')})) AS BIGINT)
         AS chars_removed,
       CAST(COUNT(DISTINCT {_pii_sql_expr('c_name')}) AS BIGINT) AS n_distinct_scrubbed
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("t18_pii_scrub", oracle=_T18_SQL,
          doc="PII redaction (email / IPv4 / long-digit-run -> tokens) as a "
              "chained JVM regexp_replace — the standard pre-training "
              "scrub stage. Scale: pure per-row map (codegen'd, zero "
              "shuffle before the small per-segment rollup); patterns are "
              "RE2-safe (no backtracking blowup on adversarial docs).",
          tags=("text", "curation"))
def t18_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    scrubbed = F.col("c_name")
    for pat, repl in _PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return (
        c.select("c_mktsegment", "c_name", scrubbed.alias("scrubbed"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("scrubbed") != F.col("c_name")).cast("long"))
            .alias("n_redacted"),
            F.sum(F.length("c_name") - F.length("scrubbed"))
            .alias("chars_removed"),
            F.countDistinct("scrubbed").alias("n_distinct_scrubbed"),
        )
        .orderBy("c_mktsegment")
    )


# --- T19: deterministic global shuffle -> training shards --------------------

_T19_SQL = """
WITH h AS (
  SELECT doc_id, n_chars,
         md5('shard:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
),
s AS (
  SELECT CAST(CAST(('0x' || substr(hx, 1, 12)) AS BIGINT) % 16 AS BIGINT) AS shard,
         hx, n_chars
  FROM h
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(hx) AS first_key,
       MAX(hx) AS last_key
FROM s GROUP BY shard ORDER BY shard
"""


@register("t19_shard_shuffle", oracle=_T19_SQL,
          doc="Deterministic global shuffle for training output: md5-keyed "
              "hash sharding (TeraSort-style, seeded by the salt) + "
              "within-shard md5 order, summarized per shard. Scale: zero "
              "global sort — shard assignment is a per-row map, balance is "
              "statistical (binomial, ±0.5% at 1e8 rows/shard), and the "
              "within-shard order key is carried, so the physical write is "
              "repartition(shard) + sortWithinPartitions(hx): one shuffle, "
              "partition-count independent, identical on any cluster.",
          tags=("text", "curation"))
def t19_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.hashing import md5_rank

    d = table(spark, sf_dir, "documents")
    h = d.select(
        "n_chars", md5_rank("doc_id", "shard:").alias("hx")
    )
    s = h.select(
        (F.conv(F.substring("hx", 1, 12), 16, 10).cast("long") % 16).alias("shard"),
        "hx",
        "n_chars",
    )
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("hx").alias("first_key"),
            F.max("hx").alias("last_key"),
        )
        .orderBy("shard")
    )


# --- T20: BPE vocabulary induction (the full merge-learning loop) -----------
# t17 is one round's pair-count primitive; this is the trainer
# itself: R rounds of (weighted pair count over the vocab -> argmax
# -> literal merge apply), the corpus scanned exactly once. No
# single-statement SQL oracle exists (each round's argmax feeds the
# next round's input), so the contract check REPLAYS every round
# procedurally in DuckDB — same alpha-token vocab, same wrapped
# representation, same replace() semantics — and demands the full
# merge table match bit-for-bit. Extends the reference's token
# surface (Data_prep.py split/regex idioms, SURVEY §2.2) to
# vocabulary induction.

_T20_ROUNDS = 10


def _duckdb_bpe_merge_table(sf_dir: str, rounds: int) -> list[tuple]:
    """Procedurally replay SEQUENTIAL greedy BPE in DuckDB: same
    alpha-token vocab, same wrapped representation, same replace()
    semantics, one UPDATE per merge round. The independent engine's
    answer for both the sequential (t20) and exact-batched (t22)
    trainers — the latter is proven bit-identical to sequential
    (operators/bpe_batched.py docstring), so one replay checks both.
    """
    import os

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TEMP TABLE vocab AS "
        "WITH tok AS (SELECT unnest("
        r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"
        ") AS tok FROM read_parquet("
        f"'{os.path.join(sf_dir, 'documents.parquet')}'))"
        "SELECT regexp_replace(tok, '(.)', '<\\1>', 'g') AS rep, "
        "COUNT(*) AS n FROM tok WHERE regexp_matches(tok, '^[a-z]+$') "
        "GROUP BY tok"
    )
    expect = []
    for rank in range(1, rounds + 1):
        row = con.execute(
            "WITH syms AS (SELECT regexp_extract_all(rep, '<([^>]*)>', 1)"
            " AS s, n FROM vocab), "
            "pairs AS (SELECT unnest(list_transform("
            "  range(1, len(s)), i -> {'l': s[i], 'r': s[i+1]})) AS p, n"
            " FROM syms WHERE len(s) >= 2) "
            "SELECT p.l, p.r, CAST(SUM(n) AS BIGINT) AS c FROM pairs "
            "GROUP BY p.l, p.r ORDER BY c DESC, p.l, p.r LIMIT 1"
        ).fetchone()
        if row is None:
            break
        l, r, c = row
        expect.append((rank, l, r, l + r, c))
        con.execute(
            "UPDATE vocab SET rep = replace(rep, ?, ?)",
            [f"<{l}><{r}>", f"<{l}{r}>"],
        )
    con.close()
    return expect


def _check_bpe_vs_duckdb(sdf, sf_dir: str, rounds: int) -> str:
    expect = _duckdb_bpe_merge_table(sf_dir, rounds)
    got = [
        (int(t.rank), t.left, t.right, t.merged, int(t.n_occurrences))
        for t in sdf.sort_values("rank").itertuples()
    ]
    if got != expect:
        return f"merge table mismatch: got {got[:3]}... want {expect[:3]}..."
    counts = [g[4] for g in got]
    if counts != sorted(counts, reverse=True):
        return f"merge counts not non-increasing: {counts}"
    return ""


def _check_t20_vs_duckdb(sdf, spark, sf_dir: str) -> str:
    return _check_bpe_vs_duckdb(sdf, sf_dir, _T20_ROUNDS)


@register("t20_bpe_train", oracle=None,
          doc="BPE vocabulary induction: 10 merge rounds learned over the "
              "alpha-token vocabulary (one corpus scan; each round one "
              "vocab-sized weighted pair count + argmax + literal merge "
              "apply). Contract check replays all 10 rounds procedurally "
              "in DuckDB and demands the merge table match exactly.",
          tags=("text", "bench"), min_rows=1,
          columns=("rank", "left", "right", "merged", "n_occurrences"),
          check=_check_t20_vs_duckdb)
def t20_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.bpe import train_bpe

    d = table(spark, sf_dir, "documents")
    return train_bpe(spark, d, rounds=_T20_ROUNDS).orderBy("rank")


# --- T22: batched BPE training (multi-merge rounds, sequential-exact) -------
# The driver-loop bound fix for vocabulary induction at production
# merge counts (VERDICT r8 #5): t20's trainer is one Spark job per
# merge; this one learns up to 16 merges per job via the disjoint-
# prefix rule that is PROVABLY bit-identical to sequential greedy
# (operators/bpe_batched.py docstring carries the proof; the (a,a)
# self-pair counterexample it survived is regression-tested in
# tests/test_bpe.py). The contract check replays all 40 rounds
# SEQUENTIALLY and procedurally in DuckDB — an independent engine
# deriving the same table through the unbatched algorithm is a direct
# check of the equivalence theorem on this corpus, not just of the
# arithmetic. The skip-conflicts production mode (exact=False,
# merges/job > 10) is benched at rounds=100 on the 10x corpus
# (bench.py "bpe" section) and golden-tested in tests/test_bpe.py.

_T22_ROUNDS = 40


def _check_t22_vs_duckdb(sdf, spark, sf_dir: str) -> str:
    return _check_bpe_vs_duckdb(sdf, sf_dir, _T22_ROUNDS)


@register("t22_bpe_batched", oracle=None,
          doc="Batched BPE vocabulary induction: 40 merges learned at up "
              "to 16 per Spark job (disjoint-prefix selection, provably "
              "bit-identical to sequential greedy). Contract check replays "
              "all 40 rounds sequentially+procedurally in DuckDB and "
              "demands the merge table match exactly.",
          tags=("text", "bench"), min_rows=_T22_ROUNDS,
          columns=("rank", "left", "right", "merged", "n_occurrences"),
          check=_check_t22_vs_duckdb)
def t22_bpe_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.bpe_batched import (
        train_bpe_batched,
    )

    d = table(spark, sf_dir, "documents")
    return train_bpe_batched(spark, d, rounds=_T22_ROUNDS).orderBy("rank")


# --- T21: BPE tokenizer application (fixed merge table, oracled) ------------
# Tokenizer application at corpus scale: encode the VOCABULARY under
# a merge table (vocab-sized work), then roll subword statistics up
# weighted by word counts — the corpus itself is only ever touched
# by the one vocab-building scan; at 100 TB the encoded vocab is the
# broadcast/join artifact that tokenizes the token stream. The merge
# table here is fixed (8 common-English merges, incl. the 2-stage
# th+e -> the) so the whole operator is a pure function of the data
# and DuckDB replays it bit-for-bit: wrapping, the literal replace
# chain (identical leftmost non-overlapping semantics in Java
# String.replace and DuckDB replace()), and the weighted rollup.

_T21_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
]
_T21_TOPK = 20


def _t21_rep_sql() -> str:
    expr = r"regexp_replace(tok, '(.)', '<\1>', 'g')"
    for a, b in _T21_MERGES:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    return expr


_T21_SQL = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
vocab AS (
  SELECT tok, COUNT(*) AS n FROM tok
  WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY tok
),
enc AS (SELECT {_t21_rep_sql()} AS rep, n FROM vocab),
sub AS (
  SELECT unnest(regexp_extract_all(rep, '<([^>]*)>', 1)) AS subword, n
  FROM enc
)
SELECT subword, CAST(SUM(n) AS BIGINT) AS total_occurrences
FROM sub GROUP BY subword
ORDER BY total_occurrences DESC, subword
LIMIT {_T21_TOPK}
"""


@register("t21_bpe_encode", oracle=_T21_SQL,
          doc="BPE tokenizer application: encode the word vocabulary under "
              "a fixed 8-merge table (literal <a><b> -> <ab> replace chain, "
              "greedy-leftmost — the Sennrich re.sub semantics), roll up "
              "subword occurrences weighted by word counts, top-20. "
              "Vocab-sized work after one corpus scan.",
          tags=("text",))
def t21_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.bpe import (
        encode_with_merges,
        word_vocab,
    )

    d = table(spark, sf_dir, "documents")
    enc = encode_with_merges(word_vocab(d), _T21_MERGES)
    return (
        enc.select(F.explode("subwords").alias("subword"), "n")
        .groupBy("subword")
        .agg(F.sum("n").alias("total_occurrences"))
        .orderBy(F.desc("total_occurrences"), "subword")
        .limit(_T21_TOPK)
    )


# --- PIPE6: per-source pretraining data card ---------------------------------
# The summary artifact a curation run ships with the dataset: one row
# per source with volume (docs/tokens), the t12 mixture weight, the
# t2 quality-gate pass count, the d1 exact-dup redundancy count and
# the t3 dominant predicted language. Every ingredient is an
# already-◆-checked operator; this query checks their composition
# (same pattern as pipe1/pipe3). Scale: everything is one doc-level
# map + source-keyed aggregates; the only joins are doc_id-keyed
# (quality, lang votes) and the 1-row normalizer broadcast — output
# is |sources| rows at any corpus size.

from ae_data_integration_spark.functions.text import fingerprint  # noqa: E402

_PIPE6_SQL = f"""
WITH per_doc AS (
  SELECT source, doc_id, len({_TOKS}) AS n,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
         sqrt(CAST(SUM(n) AS DOUBLE)) AS r
  FROM per_doc GROUP BY source
),
tot AS (SELECT {fpsum_sql('r', Q30)} AS z FROM per_src),
q AS ({_T2_SQL.replace("ORDER BY doc_id", "")}),
qp AS (
  SELECT p.source, COUNT(*) AS n_quality_pass
  FROM per_doc p JOIN q ON p.doc_id = q.doc_id
  WHERE q.quality >= 0.5 GROUP BY p.source
),
canon AS (SELECT MIN(doc_id) AS keep_id FROM per_doc GROUP BY fp),
red AS (
  SELECT p.source, COUNT(*) AS n_exact_redundant
  FROM per_doc p LEFT JOIN canon c ON p.doc_id = c.keep_id
  WHERE c.keep_id IS NULL GROUP BY p.source
),
tok3 AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
hits3 AS (
  SELECT t.doc_id, m.lang_pred, COUNT(*) AS n_hits
  FROM tok3 t JOIN {_markers_values_sql()} ON t.tok = m.marker
  GROUP BY t.doc_id, m.lang_pred
),
lang_doc AS (
  SELECT doc_id, lang_pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY n_hits DESC, lang_pred) AS rk
    FROM hits3
  ) WHERE rk = 1
),
lv AS (
  SELECT p.source, l.lang_pred, COUNT(*) AS n
  FROM per_doc p JOIN lang_doc l ON p.doc_id = l.doc_id
  GROUP BY p.source, l.lang_pred
),
top_lang AS (
  SELECT source, lang_pred AS top_lang, n AS top_lang_docs FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n DESC, lang_pred) AS rk
    FROM lv
  ) WHERE rk = 1
)
SELECT s.source, s.n_docs, s.n_tokens,
       round(s.r / t.z, 6) AS mix_weight,
       COALESCE(qp.n_quality_pass, CAST(0 AS BIGINT)) AS n_quality_pass,
       COALESCE(red.n_exact_redundant, CAST(0 AS BIGINT)) AS n_exact_redundant,
       tl.top_lang, tl.top_lang_docs
FROM per_src s CROSS JOIN tot t
LEFT JOIN qp ON s.source = qp.source
LEFT JOIN red ON s.source = red.source
LEFT JOIN top_lang tl ON s.source = tl.source
ORDER BY s.source
"""


@register("pipe6_data_card", oracle=_PIPE6_SQL,
          doc="Per-source pretraining data card: docs/tokens, t12 mixture "
              "weight, t2 quality-gate pass count, d1 exact-dup redundancy, "
              "t3 dominant predicted language — the composition of four "
              "verified operators into the dataset's shipping summary. "
              "All source-keyed aggregates + doc_id joins; |sources| rows "
              "out at any corpus size.",
          tags=("text", "pipeline", "bench"))
def pipe6_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", "doc_id",
        token_count("text").alias("n"),
        fingerprint("text").alias("fp"),
        quality_score("text").alias("quality"),
    )
    per_src = (
        per_doc.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("n_tokens"))
        .withColumn("r", F.sqrt(F.col("n_tokens").cast("double")))
    )
    tot = per_src.agg(fpsum("r", Q30).alias("z"))
    qp = (
        per_doc.filter(F.col("quality") >= 0.5)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_quality_pass"))
    )
    canon = per_doc.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    red = (
        per_doc.join(canon, per_doc["doc_id"] == canon["keep_id"], "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_exact_redundant"))
    )
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    hits = (
        tok.join(F.broadcast(lang_marker_table(spark)), tok.tok == F.col("marker"))
        .groupBy("doc_id", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), "lang_pred")
    lang_doc = (
        hits.withColumn("rk", F.row_number().over(w_doc))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang_pred")
    )
    lv = (
        per_doc.select("source", "doc_id")
        .join(lang_doc, "doc_id")
        .groupBy("source", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = Window.partitionBy("source").orderBy(F.desc("n"), "lang_pred")
    top_lang = (
        lv.withColumn("rk", F.row_number().over(w_src))
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.col("lang_pred").alias("top_lang"),
            F.col("n").alias("top_lang_docs"),
        )
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .join(qp, "source", "left")
        .join(red, "source", "left")
        .join(top_lang, "source", "left")
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("r") / F.col("z"), 6).alias("mix_weight"),
            F.coalesce("n_quality_pass", F.lit(0).cast("long")).alias(
                "n_quality_pass"
            ),
            F.coalesce("n_exact_redundant", F.lit(0).cast("long")).alias(
                "n_exact_redundant"
            ),
            "top_lang", "top_lang_docs",
        )
        .orderBy("source")
    )


# --- PIPE7: temperature-mixture resampling (the data-mixing recipe) ----------
# The step AFTER t12's mixture weights: actually selecting the
# training subset. Per-source temperature-scaled weights (alpha = 0.5
# via sqrt — IEEE-exact, the t12 discipline) allocate a global token
# budget (25% of corpus tokens); within each source, documents are
# taken in md5('mix'||doc_id) order until the cumulative token count
# fills the source's budget — the deterministic equivalent of the
# temperature-sampling pass in multilingual/pretraining mixture
# recipes (upsamples small sources relative to their share, bounded
# by the budget). Scale shape: ONE corpus scan -> source-keyed
# aggregate (map-side combined), one source-partitioned window for
# the cumulative sum (integer token counts — exact under any
# partitioning), one broadcast join of the ~|sources| budget table.
# No global sort, no driver data.

_PIPE7_SQL = f"""
WITH per_doc AS (
  SELECT source, doc_id, CAST(len({_TOKS}) AS BIGINT) AS n FROM documents
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
         sqrt(CAST(SUM(n) AS DOUBLE)) AS r
  FROM per_doc GROUP BY source
),
tot AS (
  SELECT {fpsum_sql('r', Q30)} AS z,
         CAST(SUM(n_tokens) AS BIGINT) AS t
  FROM per_src
),
wsrc AS (
  SELECT source, n_docs, n_tokens, round(r / z, 6) AS mix_weight,
         CAST(floor(floor(t / 4.0) * round(r / z, 6)) AS BIGINT) AS budget_tokens
  FROM per_src CROSS JOIN tot
),
ranked AS (
  SELECT source, doc_id, n,
         SUM(n) OVER (PARTITION BY source
                      ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)), doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_doc
),
sel AS (
  SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n_selected,
         CAST(SUM(r.n) AS BIGINT) AS tokens_selected
  FROM ranked r JOIN wsrc w ON r.source = w.source
  WHERE r.cum <= w.budget_tokens
  GROUP BY r.source
)
SELECT w.source, w.n_docs, w.n_tokens, w.mix_weight, w.budget_tokens,
       COALESCE(s.n_selected, 0) AS n_selected,
       COALESCE(s.tokens_selected, 0) AS tokens_selected
FROM wsrc w LEFT JOIN sel s ON w.source = s.source
ORDER BY w.source
"""


@register("pipe7_temperature_mixture", oracle=_PIPE7_SQL,
          doc="Temperature-mixture resampling: alpha=0.5 source weights "
              "(sqrt — IEEE-exact) allocate a 25%-of-corpus token budget; "
              "docs selected per source in md5 order until the budget "
              "fills. One corpus scan, one source-keyed window, broadcast "
              "budget table; per-source selection summary.",
          tags=("text", "pipeline", "bench"))
def pipe7_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.hashing import md5_rank

    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", "doc_id", token_count("text").cast("long").alias("n")
    )
    per_src = (
        per_doc.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("n_tokens"))
        .withColumn("r", F.sqrt(F.col("n_tokens").cast("double")))
    )
    tot = per_src.agg(
        fpsum("r", Q30).alias("z"), F.sum("n_tokens").alias("t")
    )
    wsrc = per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("r") / F.col("z"), 6).alias("mix_weight"),
        F.floor(
            F.floor(F.col("t") / F.lit(4.0)) * F.round(F.col("r") / F.col("z"), 6)
        ).cast("long").alias("budget_tokens"),
    )
    w = Window.partitionBy("source").orderBy(
        md5_rank("doc_id", "mix"), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_doc.select("source", "n", F.sum("n").over(w).alias("cum"))
    sel = (
        ranked.join(
            F.broadcast(wsrc.select("source", "budget_tokens")), "source"
        )
        .filter(F.col("cum") <= F.col("budget_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n").alias("tokens_selected"),
        )
    )
    return (
        wsrc.join(sel, "source", "left")
        .select(
            "source", "n_docs", "n_tokens", "mix_weight", "budget_tokens",
            F.coalesce("n_selected", F.lit(0).cast("long")).alias("n_selected"),
            F.coalesce("tokens_selected", F.lit(0).cast("long")).alias(
                "tokens_selected"
            ),
        )
        .orderBy("source")
    )


# --- T23: n-gram LM perplexity quality filter (CCNet-style) ------------------
# The canonical LLM-corpus quality stage this catalog was still
# missing: train a smoothed bigram language model on a REFERENCE
# slice (here lang='en' — the CCNet recipe trains on Wikipedia),
# score every document by average per-token negative log-likelihood
# (monotone in perplexity; exp() is deliberately never taken), and
# bucket the corpus into head/middle/tail perplexity terciles — the
# standard keep/downsample/drop split.
#
# Exactness: per-token -ln P is Q30-quantized before the per-doc sum
# (ln is not correctly-rounded IEEE; the quantized partials make the
# sum order- and partition-independent — t14's discipline); the
# per-doc average divides two exactly-representable integers, so it
# is bit-portable unrounded. Vocabulary is top-64 train tokens by
# (count DESC, token) — an exact, tie-broken rule; OOV maps to
# '<unk>', document starts to a '<s>' context; add-1 smoothing over
# the 65-symbol emission space.
#
# Scale shape: the LM is MODEL-SIZED (≤ 65×65 bigram rows + 65
# contexts) and broadcasts to the scoring scan; token→vocab mapping
# is a 64-literal isin inside an array transform (zero shuffle);
# bigram pairs come from a transform-with-index over the mapped
# array (zero shuffle, no per-token lag window); scoring is one
# doc_id-keyed aggregate. The terciles use functions/ranks.py's
# distributed order statistics — per-partition offsets + two direct
# row fetches — NEVER a global single-partition row_number/ntile;
# the oracle replays the identical boundaries with a plain ntile(3)
# because order-statistic VALUES are partition-independent.

_T23_V = 64           # reference vocabulary size
_T23_EMIT = _T23_V + 1  # |vocab ∪ {<unk>}| — add-1 smoothing mass

_T23_CTES = f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
tr AS (SELECT unnest(t) AS w FROM tok WHERE lang = 'en'),
vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS n FROM tr GROUP BY w
    ORDER BY n DESC, w LIMIT {_T23_V}
  )
),
tokpos AS (
  SELECT tw.doc_id, tw.lang, tw.i,
         CASE WHEN v.w IS NOT NULL THEN tw.w ELSE '<unk>' END AS m
  FROM (SELECT doc_id, lang, u.i AS i, t[u.i] AS w
        FROM tok, unnest(range(1, len(t) + 1)) AS u(i)) tw
  LEFT JOIN vocab v ON tw.w = v.w
),
pairs AS (
  SELECT doc_id, lang,
         lag(m, 1, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS prev,
         m AS cur
  FROM tokpos
),
bg AS (SELECT prev, cur, COUNT(*) AS c FROM pairs WHERE lang = 'en'
       GROUP BY prev, cur),
ctx AS (SELECT prev, COUNT(*) AS c FROM pairs WHERE lang = 'en'
        GROUP BY prev),
nll AS (
  SELECT p.doc_id,
         CAST(round(-ln((COALESCE(bg.c, 0) + 1.0)
                        / (COALESCE(ctx.c, 0) + {_T23_EMIT}.0))
                    * 1073741824) AS BIGINT) AS q
  FROM pairs p
  LEFT JOIN bg ON p.prev = bg.prev AND p.cur = bg.cur
  LEFT JOIN ctx ON p.prev = ctx.prev
),
doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         SUM(q) / (COUNT(*) * 1073741824.0) AS avg_nll
  FROM nll GROUP BY doc_id
),
bucketed AS (
  SELECT doc_id, n_tok, avg_nll,
         CASE ntile(3) OVER (ORDER BY avg_nll, doc_id)
           WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
  FROM doc
)"""

# The WITH...bucketed prefix is shared with pipe8_ccnet_curation,
# which cuts the corpus by (language, perplexity bucket) — keep the
# CTE text in ONE place so both oracles replay the identical LM and
# tercile boundaries (the BM25_SCORED_CTES discipline).
_T23_SQL = f"""{_T23_CTES}
SELECT doc_id, n_tok, avg_nll, bucket
FROM bucketed
ORDER BY doc_id
"""


def _t23_lm(spark: SparkSession, sf_dir: str):
    """(vocab, bg, ctx) — the t23 bigram-LM artifact, trained on the
    lang='en' reference slice (operators/lm.py primitives)."""
    from ae_data_integration_spark.operators.lm import (
        bigram_pairs,
        top_vocab,
        train_bigram_counts,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens("text").alias("t"))
    vocab = top_vocab(toks.filter(F.col("lang") == "en"), "t", _T23_V)
    train = bigram_pairs(
        toks.filter(F.col("lang") == "en"), vocab, "t", keep=("doc_id",)
    )
    bg, ctx = train_bigram_counts(train)
    return toks, vocab, bg, ctx


def _t23_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tok, avg_nll) under the t23 bigram LM — the scored
    frame before tercile bucketing (twin of _T23_SQL's `doc` CTE)."""
    from ae_data_integration_spark.operators.lm import bigram_pairs, score_pairs

    toks, vocab, bg, ctx = _t23_lm(spark, sf_dir)
    pairs = bigram_pairs(toks, vocab, "t", keep=("doc_id",))
    return score_pairs(pairs, bg, ctx, _T23_EMIT)


def _t23_bucketize(scored: DataFrame, eager: bool = True) -> DataFrame:
    """Exact head/middle/tail terciles of a (doc_id, n_tok, avg_nll)
    frame via distributed order statistics — the twin of _T23_CTES'
    `bucketed` (ntile(3)) without a single-partition window.

    ``eager`` picks how ``scored`` is materialized for the 3 reads
    that follow (range-sample, sort shuffle, bucket projection) —
    either way the upstream computes ONCE and the bucket values are
    identical:

    * ``True`` (default) — eager ``localCheckpoint``: one dedicated
      materialization job, but every follow-up job plans against a
      flat checkpoint scan. Right for the all-in-one oracle-replay
      forms (t23/t25) whose inline-LM lineage is expensive to
      RE-ANALYZE — with a lazy cache each of the ~5 follow-up jobs
      pays Catalyst analysis of the full training tree again
      (measured: t23 2.11 -> 2.83 s under the lazy form).
    * ``False`` — lazy ``persist``: the range-sampling job fills the
      cache, saving the dedicated materialization job. Right for the
      artifact-backed serve paths (t23q/t25q/t25k, pipe9) whose
      lineage is a flat parquet-scan + map + agg (measured: pipe9
      9.06 -> 7.83 s). scored is the per-doc aggregate — orders of
      magnitude below the token stream — so the r10 corpus-cache
      memory lesson does not apply.
    """
    import math

    from ae_data_integration_spark.functions.caching import persist_tracked
    from ae_data_integration_spark.functions.ranks import order_statistics

    scored = scored.localCheckpoint() if eager else persist_tracked(scored)
    # The empty-corpus case rides the order-statistics partition
    # aggregate (n == 0 -> no ranks requested) instead of paying a
    # separate rdd.isEmpty() job per bucketize call.
    bounds, _n = order_statistics(
        scored,
        ["avg_nll", "doc_id"],
        lambda n: [] if n == 0 else [math.ceil(n / 3), math.ceil(2 * n / 3)],
    )
    if _n == 0:  # empty corpus: no boundaries to fetch
        return scored.withColumn("bucket", F.lit("head")).limit(0)
    b1, b2 = bounds

    def le(bound) -> F.Column:  # (avg_nll, doc_id) <= bound, tuple order
        return (F.col("avg_nll") < F.lit(bound["avg_nll"])) | (
            (F.col("avg_nll") == F.lit(bound["avg_nll"]))
            & (F.col("doc_id") <= F.lit(bound["doc_id"]))
        )

    return (
        scored.select(
            "doc_id",
            "n_tok",
            "avg_nll",
            F.when(le(b1), F.lit("head"))
            .when(le(b2), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


@register("t23_lm_perplexity", oracle=_T23_SQL,
          doc="CCNet-style quality filter: bigram LM (add-1, top-64 vocab) "
              "trained on the lang='en' reference slice, every doc scored "
              "by Q30-quantized avg token NLL, corpus bucketed into exact "
              "head/middle/tail perplexity terciles via distributed order "
              "statistics (functions/ranks.py) — no single-partition "
              "window; the oracle replays the boundaries with ntile(3).",
          tags=("text", "quality", "bench"))
def t23_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t23_bucketize(_t23_scored(spark, sf_dir))


@register("t23q_lm_serve", oracle=_T23_SQL,
          doc="t23 as a deployed stage: the bigram LM trains ONCE into a "
              "content-addressed parquet artifact (vocab/bg/ctx + _DONE, "
              "the ann_index discipline) and scoring runs against the "
              "stored tables — same oracle as t23, so the value hash "
              "proves the artifact equals the replayed training "
              "bit-for-bit.",
          tags=("text", "quality"))
def t23q_lm_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.lm import ensure_lm, lm_serve_scored

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens("text").alias("t"))
    path = ensure_lm(
        toks, "t", train_filter=(F.col("lang") == "en"), v=_T23_V, salt="t23"
    )
    return _t23_bucketize(lm_serve_scored(toks, path, "t"), eager=False)


# --- T24: tokenizer fertility / compression per source -----------------------
# The tokenizer-evaluation report a pretraining pipeline runs before
# committing to a vocabulary: subword fertility (BPE tokens per
# word) and chars-per-subword compression, per source, under the
# SAME fixed 8-merge table t21 encodes with. The corpus is never
# re-encoded per token: the encoded vocabulary (word → subword
# count) is a vocab-sized broadcast joined onto one corpus word
# scan — the t21 serving pattern, measured here instead of sampled.
# All output ratios divide exactly-representable longs: bit-portable
# unrounded.

_T24_SQL = f"""
WITH vocab AS (
  SELECT tok, COUNT(*) AS n FROM (
    SELECT unnest({_TOKS}) AS tok FROM documents
  ) WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY tok
),
enc AS (
  SELECT tok, len(regexp_extract_all({_t21_rep_sql()}, '<([^>]*)>', 1)) AS ns
  FROM vocab
),
w AS (
  SELECT source, tok FROM (
    SELECT source, unnest({_TOKS}) AS tok FROM documents
  ) WHERE regexp_matches(tok, '^[a-z]+$')
)
SELECT w.source,
       COUNT(*) AS n_words,
       CAST(SUM(e.ns) AS BIGINT) AS n_subwords,
       CAST(SUM(length(w.tok)) AS BIGINT) AS n_chars,
       SUM(e.ns) / COUNT(*) AS fertility,
       SUM(length(w.tok)) / CAST(SUM(e.ns) AS DOUBLE) AS chars_per_subword
FROM w JOIN enc e ON w.tok = e.tok
GROUP BY w.source
ORDER BY w.source
"""


@register("t24_tokenizer_fertility", oracle=_T24_SQL,
          doc="Tokenizer evaluation under the fixed 8-merge BPE table: "
              "per-source subword fertility (subwords/word) and "
              "chars-per-subword compression. Encoded vocab is a "
              "vocab-sized broadcast onto one corpus word scan (the t21 "
              "serving pattern); one source-keyed aggregate out.",
          tags=("text",))
def t24_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.bpe import (
        encode_with_merges,
        word_vocab,
    )

    d = table(spark, sf_dir, "documents")
    enc = encode_with_merges(word_vocab(d), _T21_MERGES).select(
        "tok", F.size("subwords").cast("long").alias("ns")
    )
    w = d.select(
        "source", F.explode(tokens("text")).alias("tok")
    ).filter(F.col("tok").rlike("^[a-z]+$"))
    return (
        w.join(F.broadcast(enc), "tok")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("ns").alias("n_subwords"),
            F.sum(F.length("tok")).alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_subwords",
            "n_chars",
            (F.col("n_subwords") / F.col("n_words")).alias("fertility"),
            (F.col("n_chars") / F.col("n_subwords").cast("double")).alias(
                "chars_per_subword"
            ),
        )
        .orderBy("source")
    )


# --- PIPE8: CCNet-style curation cut (language × perplexity bucket) ----------
# The shard manifest the CCNet pipeline actually ships: the corpus
# cut by (predicted language, perplexity tercile), with doc counts,
# token mass and each cell's share of total tokens — the table a
# pretraining run reads to decide which (lang, head/middle/tail)
# shards to keep, downsample or drop. Composes two already-◆-checked
# operators: t3's marker-vote language ID (docs with no marker hits
# fall to 'und') and t23's LM terciles; the oracle replays BOTH
# end-to-end via the shared _T23_CTES prefix, so the hash gate covers
# the composition, not just the parts.
# Scale shape: everything corpus-sized is one of the already-audited
# t3/t23 passes; the final rollup is a ≤ |langs|×3-row aggregate with
# a 1-row totals broadcast.

_PIPE8_SQL = f"""{_T23_CTES},
tok8 AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
hits8 AS (
  SELECT t.doc_id, m.lang_pred, COUNT(*) AS n_hits
  FROM tok8 t JOIN {_markers_values_sql()} ON t.tok = m.marker
  GROUP BY t.doc_id, m.lang_pred
),
ld8 AS (
  SELECT doc_id, lang_pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY n_hits DESC, lang_pred) AS rk
    FROM hits8
  ) WHERE rk = 1
),
tot8 AS (SELECT SUM(n_tok) AS all_tokens FROM bucketed)
SELECT COALESCE(l.lang_pred, 'und') AS lang_pred, b.bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(b.n_tok) AS BIGINT) AS n_tokens,
       SUM(b.n_tok) / CAST(t.all_tokens AS DOUBLE) AS token_share
FROM bucketed b
LEFT JOIN ld8 l ON b.doc_id = l.doc_id
CROSS JOIN tot8 t
GROUP BY 1, 2, t.all_tokens
ORDER BY 1, 2
"""


@register("pipe8_ccnet_curation", oracle=_PIPE8_SQL,
          doc="CCNet-style shard manifest: corpus cut by (t3 predicted "
              "language, t23 perplexity tercile) with doc counts, token "
              "mass and token share — the keep/downsample/drop table a "
              "pretraining run ships. Composition of two oracled "
              "operators, replayed end-to-end; final rollup is "
              "|langs|x3 rows with a 1-row totals broadcast.",
          tags=("text", "quality", "pipeline"))
def pipe8_ccnet_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = t23_lm_perplexity(spark, sf_dir)
    ld = t3_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    tot = b.agg(F.sum("n_tok").alias("all_tokens"))
    return (
        b.join(ld, "doc_id", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"), "bucket"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.max("all_tokens").alias("_t"),
        )
        .select(
            "lang_pred",
            "bucket",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") / F.col("_t").cast("double")).alias(
                "token_share"
            ),
        )
        .orderBy("lang_pred", "bucket")
    )


# --- T23b: per-language perplexity terciles (the CCNet per-lang form) --------
# CCNet buckets perplexity WITHIN each language (a hard corpus is not
# a bad corpus — tail-of-French ≠ tail-of-English): docs carry their
# t3 predicted language ('und' when no marker hits), and terciles are
# computed per language group. The per-group split is a KEYED window
# (partition-local ntile over lang groups — the standard w1-w5
# shape), not a global sort; if one language dominated a 100-TB
# corpus its group becomes the hot task, and the escape hatch is the
# per-group generalization of functions/ranks.py (boundary order
# statistics per key, broadcast back) — documented, not needed at
# these group sizes.

_T23B_SQL = f"""{_T23_CTES},
tok8 AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
hits8 AS (
  SELECT t.doc_id, m.lang_pred, COUNT(*) AS n_hits
  FROM tok8 t JOIN {_markers_values_sql()} ON t.tok = m.marker
  GROUP BY t.doc_id, m.lang_pred
),
ld8 AS (
  SELECT doc_id, lang_pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY n_hits DESC, lang_pred) AS rk
    FROM hits8
  ) WHERE rk = 1
),
scored8 AS (
  SELECT d.doc_id, COALESCE(l.lang_pred, 'und') AS lang_pred,
         d.n_tok, d.avg_nll
  FROM doc d LEFT JOIN ld8 l ON d.doc_id = l.doc_id
)
SELECT doc_id, lang_pred, n_tok, avg_nll,
       CASE ntile(3) OVER (PARTITION BY lang_pred ORDER BY avg_nll, doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored8
ORDER BY doc_id
"""


@register("t23b_lang_terciles", oracle=_T23B_SQL,
          doc="Per-language perplexity terciles (the CCNet per-lang cut: "
              "hard != bad across languages): t23 NLL scores bucketed by "
              "ntile(3) WITHIN each t3-predicted language ('und' "
              "fallback) — a keyed, partition-local window, no global "
              "sort.",
          tags=("text", "quality"))
def t23b_lang_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _t23_scored(spark, sf_dir)
    ld = t3_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    s8 = scored.join(ld, "doc_id", "left").select(
        "doc_id",
        F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
        "n_tok",
        "avg_nll",
    )
    w = Window.partitionBy("lang_pred").orderBy("avg_nll", "doc_id")
    nt = F.ntile(3).over(w)
    return (
        s8.select(
            "doc_id", "lang_pred", "n_tok", "avg_nll",
            F.when(nt == 1, F.lit("head"))
            .when(nt == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# --- T25: 5-gram interpolated Kneser-Ney perplexity (the KenLM shape) ---------
# t23's bigram is the oracle-parity fixture model; the filter a
# production CCNet stage runs is a 5-gram smoothed LM. This is
# interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1999)
# at order 5 — raw counts at the top order, continuation counts
# below, D=0.75, uniform 1/(V+1) base — trained on the same lang='en'
# reference slice and scored over every document, with the same
# exact-tercile cut. The probability is assembled bottom-up in ONE
# arithmetic expression tree over integer count columns, so both
# engines compute bit-identical IEEE doubles; only -ln is quantized
# (Q30) before the per-doc sum. Model: 9 count tables + vocab —
# operators/lm.py (kn_*), with the same build/serve artifact split as
# the bigram (t25q serves the stored tables under the same oracle).
# Scale: corpus pass = zero-shuffle context map + one doc aggregate;
# the gram tables broadcast at fixture V; the documented switch when
# a web-scale table exceeds broadcast is a (ctx,w)-bucketed join.


def _kn_p_sql(v: int) -> str:
    """The KN probability as SQL — the SAME expression tree kn_score
    builds column-wise, so doubles match bit-for-bit. Count/context
    columns are table-qualified (g5.c, t5x.tot, ...)."""
    p = f"(1.0 / {v + 1}.0)"
    for k in (1, 2, 3, 4, 5):
        c, t = f"g{k}.c", f"t{k}x"
        pk = (
            f"(greatest(COALESCE(CAST({c} AS DOUBLE), 0.0) - 0.75, 0.0)"
            f" / CAST({t}.tot AS DOUBLE)"
            f" + 0.75 * CAST({t}.d AS DOUBLE) / CAST({t}.tot AS DOUBLE) * {p})"
        )
        p = (f"(CASE WHEN {t}.tot IS NOT NULL AND {t}.tot > 0"
             f" THEN {pk} ELSE {p} END)")
    return p


_T25_SQL = f"""{_T23_CTES},
kgrams AS (
  SELECT doc_id, lang,
         lag(m, 4, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS p4,
         lag(m, 3, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS p3,
         lag(m, 2, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS p2,
         lag(m, 1, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS p1,
         m AS cur
  FROM tokpos
),
g5 AS (SELECT p4, p3, p2, p1, cur, COUNT(*) AS c FROM kgrams
       WHERE lang = 'en' GROUP BY p4, p3, p2, p1, cur),
g4 AS (SELECT p3, p2, p1, cur, COUNT(*) AS c FROM g5 GROUP BY p3, p2, p1, cur),
g3 AS (SELECT p2, p1, cur, COUNT(*) AS c FROM g4 GROUP BY p2, p1, cur),
g2 AS (SELECT p1, cur, COUNT(*) AS c FROM g3 GROUP BY p1, cur),
g1 AS (SELECT cur, COUNT(*) AS c FROM g2 GROUP BY cur),
t5x AS (SELECT p4, p3, p2, p1, SUM(c) AS tot, COUNT(*) AS d FROM g5
        GROUP BY p4, p3, p2, p1),
t4x AS (SELECT p3, p2, p1, SUM(c) AS tot, COUNT(*) AS d FROM g4
        GROUP BY p3, p2, p1),
t3x AS (SELECT p2, p1, SUM(c) AS tot, COUNT(*) AS d FROM g3 GROUP BY p2, p1),
t2x AS (SELECT p1, SUM(c) AS tot, COUNT(*) AS d FROM g2 GROUP BY p1),
t1x AS (SELECT SUM(c) AS tot, COUNT(*) AS d FROM g1),
knq AS (
  SELECT k.doc_id,
         CAST(round(-ln({_kn_p_sql(_T23_V)}) * 1073741824) AS BIGINT) AS q
  FROM kgrams k
  LEFT JOIN g5 ON k.p4 = g5.p4 AND k.p3 = g5.p3 AND k.p2 = g5.p2
              AND k.p1 = g5.p1 AND k.cur = g5.cur
  LEFT JOIN g4 ON k.p3 = g4.p3 AND k.p2 = g4.p2 AND k.p1 = g4.p1
              AND k.cur = g4.cur
  LEFT JOIN g3 ON k.p2 = g3.p2 AND k.p1 = g3.p1 AND k.cur = g3.cur
  LEFT JOIN g2 ON k.p1 = g2.p1 AND k.cur = g2.cur
  LEFT JOIN g1 ON k.cur = g1.cur
  LEFT JOIN t5x ON k.p4 = t5x.p4 AND k.p3 = t5x.p3 AND k.p2 = t5x.p2
               AND k.p1 = t5x.p1
  LEFT JOIN t4x ON k.p3 = t4x.p3 AND k.p2 = t4x.p2 AND k.p1 = t4x.p1
  LEFT JOIN t3x ON k.p2 = t3x.p2 AND k.p1 = t3x.p1
  LEFT JOIN t2x ON k.p1 = t2x.p1
  CROSS JOIN t1x
),
doc25 AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         SUM(q) / (COUNT(*) * 1073741824.0) AS avg_nll
  FROM knq GROUP BY doc_id
)
SELECT doc_id, n_tok, avg_nll,
       CASE ntile(3) OVER (ORDER BY avg_nll, doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM doc25
ORDER BY doc_id
"""


def _t25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.lm import (
        kn_ngram_pairs,
        kn_score,
        top_vocab,
        train_kn_counts,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens("text").alias("t"))
    train = toks.filter(F.col("lang") == "en")
    vocab = top_vocab(train, "t", _T23_V)
    model = train_kn_counts(kn_ngram_pairs(train, vocab, "t", keep=()))
    model = {  # materialize: every table is model-sized
        name: spark.createDataFrame(tbl.collect(), tbl.schema)
        for name, tbl in model.items()
    }
    grams = kn_ngram_pairs(toks, vocab, "t", keep=("doc_id",))
    return kn_score(grams, model, _T23_V)


@register("t25_kn5_perplexity", oracle=_T25_SQL,
          doc="5-gram interpolated Kneser-Ney quality filter (the KenLM "
              "shape behind CCNet): raw top-order counts, continuation "
              "counts below, D=0.75, uniform base — trained on the "
              "lang='en' slice, every doc scored by Q30-quantized avg "
              "NLL, exact head/middle/tail terciles. The probability "
              "expression tree is identical on both engines, so the "
              "doubles match bit-for-bit.",
          tags=("text", "quality"))
def t25_kn5_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t23_bucketize(_t25_scored(spark, sf_dir))


@register("t25q_kn5_serve", oracle=_T25_SQL,
          doc="t25 served from the persisted KN artifact (vocab + 9 "
              "count tables, content-addressed, _DONE-marker build) — "
              "same oracle as t25, so the value hash proves the stored "
              "model equals the replayed training bit-for-bit.",
          tags=("text", "quality"))
def t25q_kn5_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.lm import (
        ensure_kn_lm,
        kn_serve_scored,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens("text").alias("t"))
    path = ensure_kn_lm(
        toks, "t", train_filter=(F.col("lang") == "en"), v=_T23_V, salt="t25"
    )
    return _t23_bucketize(kn_serve_scored(toks, path, "t"), eager=False)


@register("t25k_kn5_keyed", oracle=_T25_SQL,
          doc="t25q on the FORCED keyed-join plan: every gram/context "
              "table attaches by a merge-hinted (ctx, w)-keyed join "
              "instead of a broadcast (bcast_max_bytes=0) — the "
              "web-vocab CCNet shape where the 5-gram table is "
              "corpus-scale and must never visit the driver. Same "
              "stored artifact and oracle as t25q, so the value hash "
              "proves the keyed plan bit-equals the broadcast plan.",
          tags=("text", "quality"))
def t25k_kn5_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.lm import (
        ensure_kn_lm,
        kn_serve_scored,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens("text").alias("t"))
    path = ensure_kn_lm(
        toks, "t", train_filter=(F.col("lang") == "en"), v=_T23_V, salt="t25"
    )
    return _t23_bucketize(
        kn_serve_scored(toks, path, "t", bcast_max_bytes=0), eager=False
    )


# --- SAMP3: DSIR importance-resampling selection -----------------------------
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# pick raw-corpus documents whose hashed-n-gram distribution looks
# like a TARGET slice. Two bag-of-hashed-ngrams models (unigrams +
# bigrams hashed into B buckets) are fit by counting — target = the
# lang='en' slice, raw = the whole corpus — and each doc's importance
# log-weight is sum_f c_f * (ln p_target[f] - ln p_raw[f]). Selection
# is Gumbel top-k (logw + Gumbel noise), which samples WITHOUT
# replacement with probability proportional to the importance weight
# — the paper's resampling step as one ORDER BY ... LIMIT K.
#
# Scale shape (the 100-TB story): ONE token/bigram explode and one
# (doc, bucket) count shuffle over the corpus; both models are
# B-row aggregates (broadcast — B is 64 here, 10^4 in the paper,
# model-sized either way); the per-bucket log-ratio lr_q is
# Q30-quantized ONCE per bucket so every per-doc weight is an exact
# BIGINT dot product; the Gumbel key is md5-derived (replayable,
# partition-independent) and top-k is a TakeOrdered — the corpus is
# never globally sorted. No shuffle grows with vocabulary.

_SAMP3_B = 64
_SAMP3_K = 50
_SAMP3_DENOM = 281474976710656.0  # 2^48

_SAMP3_FEAT_HASH = (
    "CAST(('0x' || substr(md5('ds:' || f), 1, 12)) AS BIGINT) % " + str(_SAMP3_B)
)

_SAMP3_SQL = f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
feat AS (
  SELECT doc_id, lang, unnest(t) AS f FROM tok
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS f
  FROM tok
),
cnt AS (
  SELECT doc_id, lang, {_SAMP3_FEAT_HASH} AS bucket, COUNT(*) AS c
  FROM feat GROUP BY doc_id, lang, bucket
),
model AS (
  SELECT b.bucket,
         COALESCE(SUM(CASE WHEN cnt.lang = 'en' THEN cnt.c END), 0) AS tc,
         COALESCE(SUM(cnt.c), 0) AS rc
  FROM (SELECT unnest(range(0, {_SAMP3_B})) AS bucket) b
  LEFT JOIN cnt USING (bucket)
  GROUP BY b.bucket
),
tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM model),
lr AS (
  SELECT bucket,
         CAST(round(
           (ln(CAST(tc + 1 AS DOUBLE) / CAST(tt + {_SAMP3_B} AS DOUBLE))
            - ln(CAST(rc + 1 AS DOUBLE) / CAST(rt + {_SAMP3_B} AS DOUBLE))) * {Q30}
         ) AS BIGINT) AS lr_q
  FROM model, tot
),
wgt AS (
  SELECT cnt.doc_id, CAST(SUM(cnt.c * lr.lr_q) AS BIGINT) AS logw_q
  FROM cnt JOIN lr USING (bucket)
  GROUP BY cnt.doc_id
)
SELECT d.doc_id, d.lang,
       COALESCE(w.logw_q, 0) AS logw_q,
       COALESCE(w.logw_q, 0) + CAST(round(
         -ln(-ln((CAST(('0x' || substr(md5('dsir' || CAST(d.doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
                 / {_SAMP3_DENOM})) * {Q30}
       ) AS BIGINT) AS key_q
FROM documents d LEFT JOIN wgt w ON d.doc_id = w.doc_id
ORDER BY key_q DESC, d.doc_id
LIMIT {_SAMP3_K}
"""


@register("samp3_dsir_select", oracle=_SAMP3_SQL,
          doc="DSIR (Xie et al. 2023): hashed unigram+bigram bag models "
              "for target (lang='en') vs raw, per-bucket Q30 log-ratio, "
              "exact-integer per-doc importance weight, Gumbel top-k "
              "resampling via md5-derived noise — proportional-to-weight "
              "selection without replacement as one TakeOrdered.",
          tags=("text", "sampling", "bench"))
def samp3_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.selection import (
        dsir_doc_keys,
        dsir_lr_table,
    )

    d = table(spark, sf_dir, "documents")
    lr = dsir_lr_table(d, target_lang="en")
    return (
        dsir_doc_keys(d, lr)
        .orderBy(F.desc("key_q"), "doc_id")
        .limit(_SAMP3_K)
    )


# --- T26: logistic-regression TRAINING in DataFrame ops ----------------------
# The training half of the fastText-style quality classifier t16 only
# scores: 3 full-batch gradient-descent iterations of binary logistic
# regression (y = lang=='en') over hashed token-bucket counts,
# entirely as DataFrame aggregates — the c1-kmeans discipline applied
# to a gradient method, with the DuckDB oracle replaying every
# iteration CTE-for-CTE.
#
# Features are binary bucket PRESENCE (the hashed bag binarized):
# raw counts put feature norms at token-count scale and full-batch GD
# at eta=0.5 diverges on them (measured); presence bounds the
# logistic Hessian by B/4, so fixed eta=0.2 descends on every
# fixture. Exactness: weights live as Q30-scaled BIGINTs, so the
# per-doc score s_q = sum_{b active} w_qb is an exact integer sum
# however the rows are partitioned; the sigmoid (the one
# non-correctly-rounded step) is quantized per doc BEFORE the
# gradient sums, making the per-bucket gradient
# g_q = sum_d (p_qd - y_d*Q30) exact too; the update
# w -= round(eta * g_q / N) is one correctly-rounded double
# division. Scale shape: the (doc, bucket) count table is
# built once (one corpus shuffle, map-side combined); each iteration
# is a broadcast join against the B-row weight table + one doc-keyed
# agg + one bucket-keyed agg; weights are collected (B rows,
# model-sized) and re-broadcast — the classic distributed full-batch
# GD, no vectors ever on the driver beyond B rows.

_T26_ITERS = 3
_T26_ETA = 0.2


def _t26_iter_sql(i: int) -> str:
    prev = f"w{i-1}"
    return f"""s{i} AS (
  SELECT c.doc_id, SUM(w.w_q) AS s_q
  FROM cnt c JOIN {prev} w USING (bucket) GROUP BY c.doc_id
),
p{i} AS (
  SELECT s.doc_id,
         CAST(round({Q30} / (1 + exp(-(s.s_q / {Q30}.0)))) AS BIGINT) AS p_q,
         y.y
  FROM s{i} s JOIN y USING (doc_id)
),
g{i} AS (
  SELECT c.bucket, SUM(p.p_q - p.y * {Q30}) AS g_q
  FROM cnt c JOIN p{i} p USING (doc_id) GROUP BY c.bucket
),
w{i} AS (
  SELECT w.bucket,
         w.w_q - CAST(round({_T26_ETA} * COALESCE(g.g_q, 0) / n.n) AS BIGINT) AS w_q
  FROM {prev} w LEFT JOIN g{i} g USING (bucket), n
)"""


# WITH-prefix shared with pipe8b_classifier_curation, which scores
# and cuts the corpus by the trained weights — one CTE text so both
# oracles replay the identical training (the _T23_CTES discipline).
_T26_CTES = f"""WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
cnt AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) % {_T16_B} AS bucket
  FROM tok
),
y AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
w0 AS (SELECT unnest(range(0, {_T16_B})) AS bucket, CAST(0 AS BIGINT) AS w_q),
{','.join(_t26_iter_sql(i) for i in range(1, _T26_ITERS + 1))}"""

_T26_SQL = f"""
{_T26_CTES}
SELECT bucket, w_q FROM w{_T26_ITERS} ORDER BY bucket
"""


@register("t26_logreg_train", oracle=_T26_SQL,
          doc="Binary logistic-regression training (y = lang=='en') over "
              "hashed binary bucket-presence features: 3 full-batch GD "
              "iterations (eta=0.2) as pure DataFrame aggregates, "
              "Q30-integer weights/scores, sigmoid quantized per doc "
              "before gradient sums; oracle replays every iteration "
              "CTE-for-CTE (the c1 discipline).",
          tags=("text", "quality", "training"))
def t26_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.caching import persist_tracked

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
        % F.lit(_T16_B)
    )
    cnt = (
        tok.select("doc_id", bucket.alias("bucket"))
        .distinct()
        .transform(persist_tracked)
    )
    y = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )
    n_docs = d.count()  # one scalar; the oracle's n CTE
    w = spark.createDataFrame(
        [(b, 0) for b in range(_T16_B)], "bucket long, w_q long"
    )
    for _ in range(_T26_ITERS):
        s = (
            cnt.join(F.broadcast(w), "bucket")
            .groupBy("doc_id")
            .agg(F.sum("w_q").alias("s_q"))
        )
        p = s.join(y, "doc_id").select(
            "doc_id",
            F.round(
                F.lit(Q30)
                / (1 + F.exp(-(F.col("s_q") / F.lit(float(Q30)))))
            ).cast("long").alias("p_q"),
            "y",
        )
        g = (
            cnt.join(p, "doc_id")
            .groupBy("bucket")
            .agg(
                F.sum(F.col("p_q") - F.col("y") * F.lit(Q30)).alias("g_q")
            )
        )
        w_next = (
            w.join(g, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w_q")
                    - F.round(
                        F.lit(_T26_ETA)
                        * F.coalesce(F.col("g_q"), F.lit(0))
                        / F.lit(float(n_docs))
                    ).cast("long")
                ).alias("w_q"),
            )
        )
        # materialize: the model is B rows, re-broadcast next iteration
        w = spark.createDataFrame(w_next.collect(), "bucket long, w_q long")
    return w.orderBy("bucket")


# --- PIPE8b: classifier-gated curation (t26 promoted into the chain) ----------
# pipe8 cuts on LM perplexity alone; this is the OTHER production
# curation gate — the trained quality classifier scores every doc and
# the cut keeps docs the model rates >= 0.5 (the sigmoid's calibration
# point: s_q >= 0 exactly, an integer comparison). Mirrors the
# reference's own classifier-over-features step (C6,
# /root/reference/Evaluation_Auxiliary/nb_classification.py:1-38) and
# the fastText quality gate in CCNet-style pipelines.
#
# Scale shape (the t23q serve discipline): training is t26's already-
# audited loop (corpus terms: ONE distinct (doc,bucket) shuffle,
# reused across iterations; everything else is B-row broadcasts);
# scoring adds zero corpus shuffles beyond the same cnt table — the
# B-row weight vector broadcasts onto it, one doc-keyed agg makes the
# exact-integer score, and the shipped manifest is a |sources|-row
# rollup. mean_p divides the exact BIGINT sum of quantized sigmoids —
# no order-dependent double sum anywhere.

_PIPE8B_SQL = f"""
{_T26_CTES},
s8b AS (
  SELECT c.doc_id, SUM(w.w_q) AS s_q
  FROM cnt c JOIN w{_T26_ITERS} w USING (bucket) GROUP BY c.doc_id
),
p8b AS (
  SELECT d.doc_id, d.source,
         CAST(round({Q30} / (1 + exp(-(COALESCE(s.s_q, 0) / {Q30}.0)))) AS BIGINT) AS p_q,
         CAST(len({_TOKS}) AS BIGINT) AS n_tok
  FROM documents d LEFT JOIN s8b s ON d.doc_id = s.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN 2 * p_q >= {Q30} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       SUM(CASE WHEN 2 * p_q >= {Q30} THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE) AS kept_share,
       CAST(SUM(CASE WHEN 2 * p_q >= {Q30} THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
       round(SUM(p_q) / (COUNT(*) * {Q30}.0), 6) AS mean_p
FROM p8b
GROUP BY source
ORDER BY source
"""


@register("pipe8b_classifier_curation", oracle=_PIPE8B_SQL,
          doc="Classifier-gated curation: the t26-trained logreg weights "
              "(B-row broadcast) score every doc by exact-integer bucket "
              "dot product; the cut keeps quantized sigmoid >= 0.5 (an "
              "integer comparison at the calibration point); per-source "
              "manifest of doc/token keep rates + mean predicted "
              "quality. Oracle splices t26's iteration CTEs and replays "
              "train->score->cut->rollup in one statement.",
          tags=("text", "quality", "pipeline"))
def pipe8b_classifier_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.caching import persist_tracked

    d = table(spark, sf_dir, "documents")
    w = t26_logreg_train(spark, sf_dir)  # B rows, already materialized
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
        % F.lit(_T16_B)
    )
    cnt = tok.select("doc_id", bucket.alias("bucket")).distinct()
    s = (
        cnt.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w_q").alias("s_q"))
    )
    p_q = F.round(
        F.lit(Q30)
        / (1 + F.exp(-(F.coalesce("s_q", F.lit(0)) / F.lit(float(Q30)))))
    ).cast("long")
    scored = (
        d.select("doc_id", "source",
                 F.size(tokens("text")).cast("long").alias("n_tok"))
        .join(s, "doc_id", "left")
        .select("doc_id", "source", "n_tok", p_q.alias("p_q"))
    )
    kept = (F.col("p_q") * 2 >= F.lit(Q30)).cast("long")
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.sum(kept * F.col("n_tok")).alias("kept_tokens"),
            F.sum("p_q").alias("_sp"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_kept") / F.col("n_docs").cast("double"))
            .alias("kept_share"),
            "kept_tokens",
            F.round(
                F.col("_sp") / (F.col("n_docs") * F.lit(float(Q30))), 6
            ).alias("mean_p"),
        )
        .orderBy("source")
    )


# --- DQ7: selection-bias audit for importance resampling ----------------------
# The governance row for samp3 (the dq4/dq5 discipline applied to
# SELECTION instead of dedup/time): what did the DSIR cut do to the
# corpus language mixture? Per language: corpus count/share vs
# selected count/share plus the add-1-smoothed log-odds bias — the
# number a curation review reads before shipping a selected subset
# (importance resampling toward an 'en' target SHOULD up-weight en;
# this row makes the magnitude auditable and alert-able). |langs|
# rows out at any corpus size; the selection is replayed via the
# shared samp3 expression and the rollup is two tiny keyed counts +
# two 1-row broadcasts.

_DQ7_SQL = f"""
WITH sel AS (SELECT * FROM ({_SAMP3_SQL})),
c AS (SELECT lang, COUNT(*) AS n_corpus FROM documents GROUP BY lang),
s AS (SELECT lang, COUNT(*) AS n_sel FROM sel GROUP BY lang),
t AS (SELECT SUM(n_corpus) AS totc, COUNT(*) AS k FROM c),
ts AS (SELECT SUM(n_sel) AS tots FROM s)
SELECT c.lang,
       CAST(c.n_corpus AS BIGINT) AS n_corpus,
       c.n_corpus / CAST(t.totc AS DOUBLE) AS share_corpus,
       CAST(COALESCE(s.n_sel, 0) AS BIGINT) AS n_selected,
       COALESCE(s.n_sel, 0) / CAST(ts.tots AS DOUBLE) AS share_selected,
       round(ln(((COALESCE(s.n_sel, 0) + 1) / CAST(ts.tots + t.k AS DOUBLE))
                / ((c.n_corpus + 1) / CAST(t.totc + t.k AS DOUBLE))), 6)
         AS bias_log_odds
FROM c LEFT JOIN s USING (lang) CROSS JOIN t CROSS JOIN ts
ORDER BY lang
"""


@register("dq7_selection_bias", oracle=_DQ7_SQL,
          doc="Selection-bias audit: per-language corpus vs DSIR-selected "
              "mixture with add-1-smoothed log-odds bias (the dq5 drift "
              "form) — replays samp3 via the shared expression, then two "
              "lang-keyed counts + two 1-row broadcasts; |langs| rows out.",
          tags=("text", "sampling", "quality"))
def dq7_selection_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = samp3_dsir_select(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_corpus"))
    s = sel.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sel"))
    t = c.agg(
        F.sum("n_corpus").alias("totc"), F.count(F.lit(1)).alias("k")
    )
    ts = s.agg(F.sum("n_sel").alias("tots"))
    n_sel0 = F.coalesce(F.col("n_sel"), F.lit(0))
    return (
        c.join(s, "lang", "left")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(ts))
        .select(
            "lang",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (F.col("n_corpus") / F.col("totc").cast("double"))
            .alias("share_corpus"),
            n_sel0.cast("long").alias("n_selected"),
            (n_sel0 / F.col("tots").cast("double")).alias("share_selected"),
            F.round(
                F.log(
                    ((n_sel0 + 1) / (F.col("tots") + F.col("k")).cast("double"))
                    / (
                        (F.col("n_corpus") + 1)
                        / (F.col("totc") + F.col("k")).cast("double")
                    )
                ), 6,
            ).alias("bias_log_odds"),
        )
        .orderBy("lang")
    )


# --- SAMP5: temperature-resampled mixture materialization -------------------
# t12 plans the mixture; pipe7 fills a TOKEN budget with a source-
# keyed cumsum window; samp5 is the WINDOW-FREE scale twin (the
# d2/d2b relationship): per-source DOC quotas computed up front from
# the alpha=0.5 temperature weights (sqrt keeps the power IEEE-exact,
# t12's trick; the normalizer is the fixed-point fpsum, and the
# share hits the Q30 grid before the integer quota arithmetic, so
# quota = (T * share_q30) // 2^30 is EXACT integer math both engines
# replay) and an md5-ranked without-replacement take per source —
# the mC4/XLM-R low-resource-upweighting step (Conneau et al. 2020,
# arXiv:1911.02116) as a deterministic relational materialization.
# Target volume T = 2/5 of the corpus; quotas cap at the source size.
#
# Scale shape: quotas are a |sources|-row broadcast; the per-source
# take is the samp4 two-level tournament (local sorted-slice top-q
# per input partition, then per-source merge of <= partitions x q
# structs) — no corpus-wide PARTITION BY source window, where pipe7's
# cumsum funnels each source through one task.

_SAMP5_SQL = f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         sqrt(CAST(COUNT(*) AS DOUBLE)) AS r
  FROM documents GROUP BY source
),
tot AS (SELECT {fpsum_sql('r', Q30)} AS z, CAST(SUM(n_docs) AS BIGINT) AS total
        FROM per_src),
quota AS (
  SELECT source, n_docs,
         least(((t.total * 2 // 5)
                * CAST(round(r / t.z * 1073741824) AS BIGINT)) // 1073741824,
               n_docs) AS quota
  FROM per_src CROSS JOIN tot t
),
ranked AS (
  SELECT d.source, d.doc_id, q.quota,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5('mix' || CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rk
  FROM documents d JOIN quota q USING (source)
)
SELECT source, doc_id, quota, rk FROM ranked WHERE rk <= quota
ORDER BY source, rk
"""


@register("samp5_temperature_mixture", oracle=_SAMP5_SQL,
          doc="Temperature-resampled mixture materialization: per-source "
              "quota = (2/5 corpus) x Q30-quantized sqrt-temperature share "
              "(exact integer arithmetic after one IEEE-exact sqrt and the "
              "fixed-point normalizer), md5-ranked without-replacement "
              "take per source via the two-level tournament.",
          tags=("text", "sampling", "pipeline", "bench"))
def samp5_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.hashing import md5_rank

    d = table(spark, sf_dir, "documents")
    per_src = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("r", F.sqrt(F.col("n_docs").cast("double")))
    )
    tot = per_src.agg(
        fpsum("r", Q30).alias("z"), F.sum("n_docs").alias("total")
    )
    quota = (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.least(
                F.expr(
                    "((total * 2 div 5)"
                    " * cast(round(r / z * 1073741824) as bigint))"
                    " div 1073741824"
                ),
                F.col("n_docs"),
            ).alias("quota"),
        )
    )
    ranked = d.select(
        "source", "doc_id", md5_rank("doc_id", "mix").alias("rkk")
    ).join(F.broadcast(quota.select("source", "quota")), "source")
    cand = F.struct(F.col("rkk"), F.col("doc_id"))
    local = (
        ranked.withColumn("_pid", F.spark_partition_id())
        .groupBy("source", "_pid")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(cand)), F.lit(1), F.max("quota")
            ).alias("cand"),
            F.max("quota").alias("quota"),
        )
    )
    sel = local.groupBy("source").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("cand"))),
            F.lit(1),
            F.max("quota"),
        ).alias("sel"),
        F.max("quota").alias("quota"),
    )
    return (
        sel.select("source", "quota", F.posexplode("sel").alias("rk0", "s"))
        .select(
            "source",
            F.col("s.doc_id").alias("doc_id"),
            "quota",
            (F.col("rk0") + 1).cast("long").alias("rk"),
        )
        .orderBy("source", "rk")
    )
