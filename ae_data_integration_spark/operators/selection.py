"""DSIR importance-resampling primitives (Xie et al., NeurIPS 2023).

The catalog row (catalog/text_q.samp3_dsir_select) and the streaming
twin (streaming/selection.py) share these builders so the streamed
selection is bit-identical to the batch one:

- ``dsir_lr_table``: fit the two hashed-ngram bag models (target
  slice vs raw corpus) and emit the per-bucket Q30-quantized
  log-likelihood ratio — B rows, model-sized, broadcastable.
- ``dsir_doc_keys``: per-doc exact-integer importance weight
  (sum c_f * lr_q over the doc's hashed features) plus the Gumbel
  key logw_q + round(Q30 * gumbel(md5(doc_id))) — deterministic,
  partition-independent, replayable by the DuckDB oracle.
- ``gumbel_topk_merge``: the mergeable-sketch step — Gumbel top-k
  satisfies topk(A ∪ B) = topk(topk(A) ∪ topk(B)) (the same
  order-statistics argument as the KMV union, functions/sketch.py),
  and keys are deterministic per doc, so a distinct-by-doc union
  followed by top-k is idempotent under micro-batch replay.

Everything is built-in JVM expressions; the only shuffle that grows
with the corpus is the (doc, bucket) count aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import Q30
from ae_data_integration_spark.functions.text import tokens

DSIR_B = 64
DSIR_K = 50
_DENOM = 281474976710656.0  # 2^48


def _bucket(f: Column) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ds:"), f)), 1, 12), 16, 10
        ).cast("long")
        % F.lit(DSIR_B)
    )


def _doc_feature_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, bucket, c): hashed unigram+bigram bag counts."""
    tok = docs.select("doc_id", "lang", tokens(text_col).alias("t"))
    uni = tok.select("doc_id", "lang", F.explode("t").alias("f"))
    big = tok.select(
        "doc_id", "lang",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("f"),
    )
    return (
        uni.unionByName(big)
        .select("doc_id", "lang", _bucket(F.col("f")).alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_lr_table(
    docs: DataFrame, target_lang: str = "en", text_col: str = "text"
) -> DataFrame:
    """The B-row model: (bucket, lr_q) with lr_q = Q30-rounded
    ln p_target[f] - ln p_raw[f] under add-1 smoothing. Fit once per
    corpus; broadcast everywhere it's consumed."""
    spark = docs.sparkSession
    cnt = _doc_feature_counts(docs, text_col)
    model = (
        spark.range(DSIR_B).withColumnRenamed("id", "bucket")
        .join(cnt, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("lang") == target_lang, F.col("c"))),
                F.lit(0),
            ).alias("tc"),
            F.coalesce(F.sum("c"), F.lit(0)).alias("rc"),
        )
    )
    tot = model.agg(F.sum("tc").alias("tt"), F.sum("rc").alias("rt"))
    return model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("tc") + 1).cast("double")
                    / (F.col("tt") + DSIR_B).cast("double")
                )
                - F.log(
                    (F.col("rc") + 1).cast("double")
                    / (F.col("rt") + DSIR_B).cast("double")
                )
            ) * F.lit(Q30)
        ).cast("long").alias("lr_q"),
    )


def dsir_doc_keys(
    docs: DataFrame, lr: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang, logw_q, key_q) for every doc — the importance
    weight as an exact BIGINT dot product against the broadcast lr
    table, plus the md5-derived Gumbel key. Deterministic per doc,
    so scoring the same doc in any micro-batch yields the same row."""
    cnt = _doc_feature_counts(docs, text_col)
    wgt = (
        cnt.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr_q")).cast("long").alias("logw_q"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir"), F.col("doc_id").cast("string"))),
                1, 12,
            ), 16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(_DENOM)
    logw = F.coalesce(F.col("logw_q"), F.lit(0))
    return docs.join(wgt, "doc_id", "left").select(
        "doc_id", "lang",
        logw.alias("logw_q"),
        (logw + F.round(-F.log(-F.log(u)) * F.lit(Q30)).cast("long"))
        .alias("key_q"),
    )


def gumbel_topk_merge(
    state: DataFrame | None, batch_keys: DataFrame, k: int = DSIR_K
) -> DataFrame:
    """Merge a (possibly None) retained top-k state with a batch's
    keyed rows and keep the top-k. Keys are deterministic per doc, so
    the max-by-doc dedup makes a replayed micro-batch a no-op."""
    merged = (
        batch_keys if state is None else state.unionByName(batch_keys)
    )
    return (
        merged.groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.first("logw_q").alias("logw_q"),
            F.first("key_q").alias("key_q"),
        )
        .orderBy(F.desc("key_q"), "doc_id")
        .limit(k)
    )
