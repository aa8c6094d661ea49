"""PIPE9: the end-to-end corpus-lifecycle composition.

Every stage of a production ingest run exists in this catalog as a
separately-oracled row — incremental dedup (pipe5b), the served LM
quality cut (t23q), the incremental ANN index append (s6i), the
per-source data card (pipe6) — but a real curation run executes them
as ONE pipeline, and both round-10 OOMs were *interaction* bugs
(cache × verify-shuffle) that single-query rows hid. pipe9 is that
composition under one value-hash gate:

    arriving batch (doc_id % 5 == 0)
      → exact-fingerprint dedup against the standing corpus
      → wide-signature MinHash-LSH near-dedup against the corpus
        (16 perms, 2 bands × 8 rows — the r ~ log N configuration)
      → accepted docs scored against the LM artifact TRAINED ON THE
        CORPUS's lang='en' slice (build-once serve path,
        operators/lm.py) and cut into exact NLL terciles
        (functions/ranks.py order statistics — no global window)
      → accepted docs' embeddings appended to the corpus PQ index
        under FROZEN codebooks (operators/ann_index.py, own salt
        'pq9' so the shared s6i artifact is never polluted) and the
        standard probe set served against base ∪ appended
      → one per-source lifecycle report: arrivals, drop provenance
        (exact vs near — the dq6 signal attribution), quality-cut
        composition of the accepted set, accepted token mass, and
        how many served top-k hits the newly-ingested docs captured.

All output columns are integers (plus the source key), so the hash
gate is bit-trivial; the DuckDB oracle replays the ENTIRE composition
end to end by splicing the proven CTE fragments of pipe5b, t23 and
s6 into one statement.

Reference parity: the reference's own evaluation is exactly this kind
of chain (/root/reference/Evaluation_Auxiliary/AE_results.ipynb cells
67-134: split → scale → infer → classify → pivot); pipe9 is the
corpus-curation analogue over this catalog's LLM-data operators.

Scale shape at 100 TB: every corpus-sized pass is one of the
already-audited component plans (the batch-∝ work of pipe5b's
broadcast-pruned verify, the zero-shuffle LM map, the codes-table
append); the report is a |sources|-keyed aggregate. Nothing here
adds a new corpus-sized shuffle over the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.catalog.dedup_q import (
    _HSET_CTE,
    _JACC,
    _P5_FP_T,
    _P5_THRESH,
    _SHS,
    _perm_mins_sql,
)
from ae_data_integration_spark.catalog.similarity_q import (
    _S6_K,
    _S6_M,
    _S6_REFINE,
    _S6_TOPK,
    _pq_ctes,
)
from ae_data_integration_spark.catalog.text_q import _T23_EMIT, _T23_V, _TOKS
from ae_data_integration_spark.functions.caching import persist_tracked
from ae_data_integration_spark.tables import table

_P9_SALT = "pq9"  # own index artifact — never the shared s6i 'pqi' dir

# --- the end-to-end oracle ----------------------------------------------------
# CTE naming: the dedup chain is d*-prefixed (dsh/dhashed/dsig/
# dbands/dcand/dnear) because the spliced PQ chain owns `cand`; the
# LM chain keeps the t23 names (tok/vocab/tokpos/bg/ctx/nll/doc/
# bucketed) — disjoint from both.

_P9_DEDUP_CTES = f"""
dsh AS (SELECT doc_id, {_SHS} AS shs FROM documents),
hashed AS (
  SELECT doc_id, shs,
         list_transform(shs, x -> CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)) AS hs
  FROM dsh
),
corpus_fp AS (
  SELECT DISTINCT {_P5_FP_T.format(t='text')} AS fp FROM documents WHERE doc_id % 5 != 0
),
b1 AS (
  SELECT d.doc_id, d.source
  FROM documents d LEFT JOIN corpus_fp f ON {_P5_FP_T.format(t='d.text')} = f.fp
  WHERE d.doc_id % 5 = 0 AND f.fp IS NULL
),
dsig AS (
  SELECT doc_id, {_perm_mins_sql(16)} AS sig FROM hashed
),
dbands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b*8 + 1 : b.b*8 + 8], '|')) AS bucket
  FROM dsig, (SELECT unnest(range(0, 2)) AS b) b
),
dcand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM dbands x
  JOIN b1 ON x.doc_id = b1.doc_id
  JOIN dbands y ON x.band = y.band AND x.bucket = y.bucket AND y.doc_id % 5 != 0
),
{_HSET_CTE},
dnear AS (
  SELECT DISTINCT p.doc_a AS doc_id
  FROM dcand p
  JOIN hset a ON p.doc_a = a.doc_id
  JOIN hset b ON p.doc_b = b.doc_id
  WHERE {_JACC} >= {_P5_THRESH}
),
acc AS (
  SELECT b1.doc_id, b1.source
  FROM b1 LEFT JOIN dnear n ON b1.doc_id = n.doc_id
  WHERE n.doc_id IS NULL
)"""

# LM trained on the CORPUS's lang='en' slice (the production shape:
# the reference LM exists before the batch arrives), scoring ONLY the
# accepted docs; terciles over the accepted set.
_P9_LM_CTES = f"""
tok AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
tr AS (SELECT unnest(t) AS w FROM tok WHERE lang = 'en' AND doc_id % 5 != 0),
vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS n FROM tr GROUP BY w
    ORDER BY n DESC, w LIMIT {_T23_V}
  )
),
scope AS (
  SELECT doc_id, 1 AS is_train FROM documents WHERE lang = 'en' AND doc_id % 5 != 0
  UNION ALL
  SELECT doc_id, 0 AS is_train FROM acc
),
tokpos AS (
  SELECT tw.doc_id, tw.is_train, tw.i,
         CASE WHEN v.w IS NOT NULL THEN tw.w ELSE '<unk>' END AS m
  FROM (SELECT s.doc_id, s.is_train, u.i AS i, t2.t[u.i] AS w
        FROM scope s JOIN tok t2 ON s.doc_id = t2.doc_id,
             unnest(range(1, len(t2.t) + 1)) AS u(i)) tw
  LEFT JOIN vocab v ON tw.w = v.w
),
lmpairs AS (
  SELECT doc_id, is_train,
         lag(m, 1, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS prev,
         m AS cur
  FROM tokpos
),
bg AS (SELECT prev, cur, COUNT(*) AS c FROM lmpairs WHERE is_train = 1
       GROUP BY prev, cur),
ctx AS (SELECT prev, COUNT(*) AS c FROM lmpairs WHERE is_train = 1
        GROUP BY prev),
nll AS (
  SELECT p.doc_id,
         CAST(round(-ln((COALESCE(bg.c, 0) + 1.0)
                        / (COALESCE(ctx.c, 0) + {_T23_EMIT}.0))
                    * 1073741824) AS BIGINT) AS q
  FROM lmpairs p
  LEFT JOIN bg ON p.prev = bg.prev AND p.cur = bg.cur
  LEFT JOIN ctx ON p.prev = ctx.prev
  WHERE p.is_train = 0
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

_P9_SQL = f"""
WITH {_P9_DEDUP_CTES.strip()},
{_P9_LM_CTES.strip()},
{_pq_ctes(salt=_P9_SALT, train_pred="id % 5 != 0",
          index_where="id % 5 != 0 OR id IN (SELECT doc_id FROM acc)")},
srcs AS (
  SELECT source, COUNT(*) AS n_arrived FROM documents
  WHERE doc_id % 5 = 0 GROUP BY source
),
ex9 AS (
  SELECT d.source, COUNT(*) AS n
  FROM documents d LEFT JOIN b1 ON d.doc_id = b1.doc_id
  WHERE d.doc_id % 5 = 0 AND b1.doc_id IS NULL GROUP BY d.source
),
nr9 AS (
  SELECT d.source, COUNT(*) AS n
  FROM dnear j JOIN documents d ON j.doc_id = d.doc_id GROUP BY d.source
),
ac9 AS (
  SELECT a.source, COUNT(*) AS n_accepted,
         CAST(SUM(CASE WHEN b.bucket = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
         CAST(SUM(CASE WHEN b.bucket = 'middle' THEN 1 ELSE 0 END) AS BIGINT) AS n_middle,
         CAST(SUM(CASE WHEN b.bucket = 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         CAST(SUM(b.n_tok) AS BIGINT) AS tok_accepted
  FROM bucketed b JOIN acc a ON b.doc_id = a.doc_id GROUP BY a.source
),
hit9 AS (
  SELECT a.source, COUNT(*) AS n
  FROM ranked r JOIN acc a ON r.n_id = a.doc_id
  WHERE r.rk <= {_S6_TOPK} GROUP BY a.source
)
SELECT s.source, s.n_arrived,
       COALESCE(e9.n, CAST(0 AS BIGINT)) AS n_exact_dup,
       COALESCE(n9.n, CAST(0 AS BIGINT)) AS n_near_dup,
       COALESCE(a9.n_accepted, CAST(0 AS BIGINT)) AS n_accepted,
       COALESCE(a9.n_head, CAST(0 AS BIGINT)) AS n_head,
       COALESCE(a9.n_middle, CAST(0 AS BIGINT)) AS n_middle,
       COALESCE(a9.n_tail, CAST(0 AS BIGINT)) AS n_tail,
       COALESCE(a9.tok_accepted, CAST(0 AS BIGINT)) AS tok_accepted,
       COALESCE(h9.n, CAST(0 AS BIGINT)) AS n_new_in_topk
FROM srcs s
LEFT JOIN ex9 e9 ON s.source = e9.source
LEFT JOIN nr9 n9 ON s.source = n9.source
LEFT JOIN ac9 a9 ON s.source = a9.source
LEFT JOIN hit9 h9 ON s.source = h9.source
ORDER BY s.source
"""


def _p9_dedup(spark: SparkSession, sf_dir: str):
    """(batch, b1, near, accepted) — the pipe5b incremental-dedup
    front half, carrying source for the report. b1/accepted are
    persisted (reused by ≥3 downstream jobs each)."""
    from ae_data_integration_spark.functions.text import fingerprint
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_candidate_pairs_across,
    )

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct()
    b1 = (
        batch.withColumn("fp", fingerprint("text"))
        .join(corpus_fp, "fp", "left_anti")
        .select("doc_id", "source", "text")
        .transform(persist_tracked)
    )
    # shingles deliberately NOT cached (pipe5's r10 lesson: a corpus-
    # sized shingle cache starves execution memory at the 1000x leg)
    sh_b = doc_shingles(b1, "doc_id", "text", k=5, spread=True)
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)
    cands = lsh_candidate_pairs_across(sh_b, sh_c, num_perm=16, num_bands=2)
    near = (
        jaccard_verify(cands, sh_b.unionByName(sh_c), threshold=_P5_THRESH)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .transform(persist_tracked)
    )
    accepted = (
        b1.join(near, "doc_id", "left_anti")
        .select("doc_id", "source", "text")
        .transform(persist_tracked)
    )
    return batch, b1, near, accepted


def _p9_quality(spark: SparkSession, sf_dir: str, accepted: DataFrame) -> DataFrame:
    """(doc_id, n_tok, avg_nll, bucket) of the accepted docs under
    the CORPUS-trained LM artifact (build-once serve path) + exact
    terciles via distributed order statistics."""
    from ae_data_integration_spark.catalog.text_q import _t23_bucketize
    from ae_data_integration_spark.functions.text import tokens
    from ae_data_integration_spark.operators.lm import ensure_lm, lm_serve_scored

    d = table(spark, sf_dir, "documents")
    corpus_toks = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang", tokens("text").alias("t")
    )
    path = ensure_lm(
        corpus_toks, "t", train_filter=(F.col("lang") == "en"),
        v=_T23_V, salt="pipe9",
    )
    acc_toks = accepted.select("doc_id", tokens("text").alias("t"))
    return _t23_bucketize(lm_serve_scored(acc_toks, path, "t"), eager=False)


def ensure_corpus_index(spark: SparkSession, sf_dir: str) -> str:
    """The pipe9 corpus PQ index (own 'pq9' salt — never the shared
    s6i artifact), built once per (params, corpus fingerprint)."""
    from ae_data_integration_spark.operators.ann_index import (
        _build_once,
        build_pq_index,
        index_dir,
    )

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    params = {"kind": "pq", "m": _S6_M, "k": _S6_K, "salt": _P9_SALT,
              "train": "mod5"}
    path = index_dir(base, "pq", params)
    return _build_once(
        path, lambda p: build_pq_index(base, p, m=_S6_M, k=_S6_K,
                                       salt=_P9_SALT)
    )


def _p9_serve_hits(
    spark: SparkSession, sf_dir: str, accepted: DataFrame, index_path: str
) -> DataFrame:
    """(source, n) top-k hits captured by newly-ingested docs: the
    standard probe set served against the appended index."""
    from ae_data_integration_spark.operators.ann_index import pq_serve_topk

    e = table(spark, sf_dir, "embeddings")
    probes = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    topk = pq_serve_topk(
        e, probes, index_path,
        m=_S6_M, k=_S6_K, refine=_S6_REFINE, topk=_S6_TOPK,
    )
    return (
        topk.join(
            accepted.select(F.col("doc_id").alias("n_id"), "source"), "n_id"
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def lifecycle_report(
    spark: SparkSession,
    sf_dir: str,
    accepted: DataFrame,
    drops: DataFrame,
    index_path: str,
) -> DataFrame:
    """The per-source lifecycle report given the ingest outcome —
    ``accepted`` (doc_id, source, text), ``drops`` (doc_id, source,
    signal ∈ {exact, near}) and the appended index. The batch query
    and the streaming twin (streaming/lifecycle.py) both end here, so
    stream==batch is asserted on the FINAL artifact."""
    bucketed = _p9_quality(spark, sf_dir, accepted)
    hits = _p9_serve_hits(spark, sf_dir, accepted, index_path)

    zero = F.lit(0).cast("long")
    # ONE per-source aggregate over the labeled batch instead of four
    # (arrived / exact drops / near drops / quality composition) + a
    # 4-way join: every former column is a conditional count over the
    # same (doc_id, source, signal) rows, so a status-labeled union
    # left-joined with the quality buckets computes all of them in a
    # single |sources|-keyed exchange (guide §2.4 — two operations
    # keyed the same way share one exchange; here seven do). Counts,
    # tie semantics and output types are unchanged: n_accepted counted
    # bucketed⋈accepted inner-join rows, which is exactly the
    # bucket-not-null rows of the left join (accepted ∩ drops = ∅ and
    # bucketed ⊆ accepted), and SUM skips the nulls n_tok carries on
    # non-scored rows.
    status = (
        accepted.select("doc_id", "source", F.lit("acc").alias("signal"))
        .unionByName(drops.select("doc_id", "source", "signal"))
        .join(bucketed.select("doc_id", "n_tok", "bucket"), "doc_id", "left")
    )
    base = status.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_arrived"),
        F.sum(F.when(F.col("signal") == "exact", 1).otherwise(0))
        .cast("long").alias("n_exact_dup"),
        F.sum(F.when(F.col("signal") == "near", 1).otherwise(0))
        .cast("long").alias("n_near_dup"),
        F.sum(F.when(F.col("bucket").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_accepted"),
        F.sum(F.when(F.col("bucket") == "head", 1).otherwise(0))
        .cast("long").alias("n_head"),
        F.sum(F.when(F.col("bucket") == "middle", 1).otherwise(0))
        .cast("long").alias("n_middle"),
        F.sum(F.when(F.col("bucket") == "tail", 1).otherwise(0))
        .cast("long").alias("n_tail"),
        F.sum("n_tok").alias("tok_accepted"),
    )
    return (
        base.join(hits.withColumnRenamed("n", "n_new_in_topk"), "source", "left")
        .select(
            "source",
            "n_arrived",
            F.coalesce("n_exact_dup", zero).alias("n_exact_dup"),
            F.coalesce("n_near_dup", zero).alias("n_near_dup"),
            F.coalesce("n_accepted", zero).alias("n_accepted"),
            F.coalesce("n_head", zero).alias("n_head"),
            F.coalesce("n_middle", zero).alias("n_middle"),
            F.coalesce("n_tail", zero).alias("n_tail"),
            F.coalesce("tok_accepted", zero).alias("tok_accepted"),
            F.coalesce("n_new_in_topk", zero).alias("n_new_in_topk"),
        )
        .orderBy("source")
    )


@register("pipe9_corpus_lifecycle", oracle=_P9_SQL,
          doc="End-to-end corpus-lifecycle composition: incremental "
              "exact+near dedup of the arriving batch against the corpus "
              "(pipe5b wide signature), accepted docs quality-cut by the "
              "corpus-trained LM artifact into exact NLL terciles (t23q "
              "serve path), their embeddings appended to the corpus PQ "
              "index under frozen codebooks and the probe set served "
              "against base+appended (s6i lifecycle) — one per-source "
              "report with drop provenance, quality composition, token "
              "mass and new-doc retrieval capture. The oracle replays "
              "the ENTIRE chain in one statement.",
          tags=("pipeline", "dedup", "quality", "similarity", "bench"))
def pipe9_corpus_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import append_to_pq_index

    batch, b1, near, accepted = _p9_dedup(spark, sf_dir)
    drops = (
        batch.join(b1.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "source", F.lit("exact").alias("signal"))
        .unionByName(
            b1.join(near, "doc_id", "left_semi")
            .select("doc_id", "source", F.lit("near").alias("signal"))
        )
    )
    path = ensure_corpus_index(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    acc_e = e.join(accepted.select(F.col("doc_id").alias("vec_id")), "vec_id")
    append_to_pq_index(acc_e, path, tag="acc")
    return lifecycle_report(spark, sf_dir, accepted, drops, path)
