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
    # empty vocab (no reference docs): every token is OOV — isin()
    # with zero arguments is an error, not an empty set
    mapper = (
        (lambda w: F.when(w.isin(*vocab), w).otherwise(F.lit(UNK)))
        if vocab
        else (lambda w: F.lit(UNK))
    )
    mm = df.withColumn("m", F.transform(arr_col, mapper))
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


# --- build/serve split (the ann_index artifact discipline) -------------------
# A production CCNet stage trains the reference LM ONCE and scores
# every arriving shard against the stored artifact; re-deriving the
# model per query (what the all-in-one t23 catalog row does for
# oracle replayability) is a fixture-scale convenience, not the
# deployment shape. The artifact is three plain parquet tables —
# vocab(w, rank), bg(prev, cur, c_bg), ctx(prev, c_ctx) — content-
# addressed by (params, dataset fingerprint) with a _DONE marker
# written last, exactly like operators/ann_index.py (same helpers).


def lm_dir(docs, params: dict) -> str:
    """Content-addressed artifact directory for an LM trained on
    ``docs`` with ``params`` (the ann_index cache-key discipline)."""
    import hashlib
    import json
    import os

    from ae_data_integration_spark.operators.ann_index import (
        _REPO,
        _dataset_fingerprint,
    )

    base = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR", os.path.join(_REPO, ".artifacts", "ann")
    )
    pkey = hashlib.md5(
        json.dumps(params, sort_keys=True).encode()
    ).hexdigest()[:12]
    return os.path.join(base, f"lm_{pkey}_{_dataset_fingerprint(docs)}")


def build_lm(
    docs: DataFrame,
    path: str,
    arr_col: str = "t",
    train_filter=None,
    v: int = 64,
) -> None:
    """Train the bigram LM on ``docs`` (optionally filtered to the
    reference slice) and persist vocab/bg/ctx as parquet under
    ``path``. Model-sized writes; the _DONE marker lands last so a
    torn build is never served."""
    from ae_data_integration_spark.operators.ann_index import _finish

    spark = docs.sparkSession
    train = docs.filter(train_filter) if train_filter is not None else docs
    vocab = top_vocab(train, arr_col, v)
    pairs = bigram_pairs(train, vocab, arr_col, keep=())
    bg, ctx = train_bigram_counts(pairs)
    spark.createDataFrame(
        [(w, i) for i, w in enumerate(vocab)], "w string, rank long"
    ).write.mode("overwrite").parquet(f"{path}/vocab")
    bg.write.mode("overwrite").parquet(f"{path}/bg")
    ctx.write.mode("overwrite").parquet(f"{path}/ctx")
    _finish(path, {"v": v, "kind": "bigram_lm"})


def ensure_lm(docs: DataFrame, arr_col: str = "t", train_filter=None,
              v: int = 64, salt: str = "") -> str:
    """Build-once: return the artifact path, training only if the
    content-addressed directory lacks a _DONE marker.

    The cache key folds in the TRAINING SLICE and token column, not
    just {v, salt} + the dataset fingerprint: two LMs over the same
    documents with different reference slices must not content-address
    to the same directory (the second caller would silently be served
    the first caller's artifact). ``train_filter`` is keyed by its
    expression text — stable for a given Column expression."""
    from ae_data_integration_spark.operators.ann_index import _done

    train_key = "" if train_filter is None else str(train_filter)
    path = lm_dir(
        docs,
        {
            "v": v,
            "salt": salt,
            "kind": "bigram_lm",
            "arr_col": arr_col,
            "train": train_key,
        },
    )
    if not _done(path):
        build_lm(docs, path, arr_col, train_filter, v)
    return path


def lm_serve_scored(
    docs: DataFrame, path: str, arr_col: str = "t", key: str = "doc_id"
) -> DataFrame:
    """(key, n_tok, avg_nll) scored against the STORED artifact: vocab
    is a model-sized collect, bg/ctx broadcast — the only corpus work
    is the zero-shuffle map + one key-keyed aggregate.

    The smoothing emission space is the DECLARED vocabulary budget
    v+1 from the artifact's meta.json, NOT the realized vocab length:
    a train slice with fewer than v distinct tokens (the fixture has
    31) must smooth identically to the all-in-one t23 query, whose
    add-1 constant is V+1 by definition."""
    import json
    import os

    spark = docs.sparkSession
    with open(os.path.join(path, "meta.json")) as fh:
        v = int(json.load(fh)["v"])
    vocab = [
        r["w"]
        for r in spark.read.parquet(f"{path}/vocab").orderBy("rank").collect()
    ]
    bg = spark.read.parquet(f"{path}/bg")
    ctx = spark.read.parquet(f"{path}/ctx")
    pairs = bigram_pairs(docs, vocab, arr_col, keep=(key,))
    return score_pairs(pairs, bg, ctx, v + 1, key)
