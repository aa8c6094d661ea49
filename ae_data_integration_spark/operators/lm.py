"""Bigram language-model primitives shared by the t23 perplexity
filter (catalog/text_q.py) and the streaming scorer
(streaming/scoring.py).

The model is deliberately MODEL-SIZED: top-V vocabulary + '<unk>'
emission + '<s>' context gives ≤ (V+1)² bigram rows and V+2 context
rows — a broadcast at serve time, batch or stream. Token→vocab
mapping is a V-literal isin inside an array transform and bigram
pairs come from a transform-with-index over the mapped array: both
are zero-shuffle map stages, so the only shuffle in a scoring pass
is the final doc-keyed aggregate.

Exactness discipline (the t14/t23 convention): per-token -ln P is
Q30-quantized before the per-doc sum (ln is not correctly-rounded
IEEE; quantized partials make the sum order- and partition-
independent); the per-doc average divides exactly-representable
integers and is bit-portable unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import Q30

UNK = "<unk>"
BOS = "<s>"


def top_vocab(toks: DataFrame, arr_col: str = "t", v: int = 64) -> list[str]:
    """Top-``v`` tokens by (count DESC, token) — the exact, tie-broken
    reference vocabulary. Model-sized collect."""
    return [
        r["w"]
        for r in (
            toks.select(F.explode(arr_col).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "w")
            .limit(v)
            .collect()
        )
    ]


def bigram_pairs(
    df: DataFrame, vocab: list[str], arr_col: str = "t", keep: tuple[str, ...] = ()
) -> DataFrame:
    """(…keep, prev, cur) bigram transitions of the vocab-mapped token
    array, with a '<s>' context at position 0. Zero shuffle: literal
    isin mapping + transform-with-index, no per-token lag window."""
    mm = df.withColumn(
        "m",
        F.transform(
            arr_col, lambda w: F.when(w.isin(*vocab), w).otherwise(F.lit(UNK))
        ),
    )
    return mm.select(
        *keep,
        F.explode(
            F.expr(
                "transform(m, (x, i) -> struct("
                f"CASE WHEN i = 0 THEN '{BOS}' ELSE m[i-1] END AS prev, "
                "x AS cur))"
            )
        ).alias("p"),
    ).select(*keep, "p.prev", "p.cur")


def train_bigram_counts(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bigram, context) count tables — the model artifact. Both are
    ≤ model-sized aggregates of the training transitions."""
    bg = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("c_ctx"))
    return bg, ctx


def score_pairs(
    pairs: DataFrame,
    bg: DataFrame,
    ctx: DataFrame,
    emit: int,
    key: str = "doc_id",
) -> DataFrame:
    """(key, n_tok, avg_nll) add-1-smoothed average NLL per document.
    ``emit`` is the smoothing emission-space size (|vocab|+1). The
    model frames broadcast; works identically on a static frame and a
    stream-static join (streaming/scoring.py)."""
    nll_q = F.round(
        -F.log(
            (F.coalesce("c_bg", F.lit(0)) + F.lit(1.0))
            / (F.coalesce("c_ctx", F.lit(0)) + F.lit(float(emit)))
        )
        * F.lit(Q30)
    ).cast("long")
    return (
        pairs.join(F.broadcast(bg), ["prev", "cur"], "left")
        .join(F.broadcast(ctx), ["prev"], "left")
        .withColumn("q", nll_q)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("q").alias("s"))
        .select(
            key,
            "n_tok",
            (F.col("s") / (F.col("n_tok") * F.lit(float(Q30)))).alias("avg_nll"),
        )
    )
