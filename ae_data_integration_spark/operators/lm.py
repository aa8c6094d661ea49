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
    expression text — stable for a given Column expression.

    Concurrent-writer safe: the build lands in a private tmp dir and
    is published by one atomic rename (ann_index._build_once), so two
    sessions racing the same content address produce exactly one
    artifact — bit-identical whichever racer wins."""
    from ae_data_integration_spark.operators.ann_index import _build_once

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
    return _build_once(
        path, lambda p: build_lm(docs, p, arr_col, train_filter, v)
    )


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


# --- 5-gram interpolated Kneser-Ney (the production quality filter) ----------
# The t23 bigram is the CCNet-parity fixture model; a real corpus
# quality filter is a higher-order smoothed LM (CCNet uses a 5-gram
# KenLM). This is interpolated Kneser-Ney (Kneser & Ney 1995; Chen &
# Goodman 1999 eq. 18) at order 5 over the same top-V vocabulary:
#
#   p_k(w|ctx) = max(c_k(ctx·w) - D, 0)/tot_k(ctx)
#                + D · distinct_k(ctx)/tot_k(ctx) · p_{k-1}(w|ctx')
#   p_0(w)     = 1/(V+1)                    (uniform over emissions)
#   unseen ctx (tot_k = 0/absent): p_k = p_{k-1}   (pure backoff)
#
# with RAW counts at the highest order and CONTINUATION counts
# N1+(• u1..uk) below — computed by the standard recursion: distinct
# 5-grams grouped by their (k)-suffix, then re-grouped downward.
# D = 0.75 (exactly representable) at every order.
#
# Exactness: every count is an integer; D, the divisions and the
# interpolation products are IEEE ops applied to identical operands
# in an identical expression tree on both engines, so p itself is
# bit-equal; only ln is not correctly rounded, so per-token -ln p is
# Q30-quantized before the per-doc sum (the t23 discipline).
#
# Scale shape: the corpus pass is the same zero-shuffle map as the
# bigram (vocab isin + transform-with-index emitting the 4-token
# context struct), then ONE doc-keyed aggregate. The model is 9
# tables (5 gram tables + 4 context tables + 1 scalar row); at V=64
# fixture scale every table broadcasts. A web-scale 5-gram table
# stops fitting a broadcast at ~10^7 rows — the switch documented in
# SCALE.md: the gram-table attach becomes a (ctx, w)-keyed bucketed
# join, the formula is unchanged.

KN_D = 0.75
KN_ORDER = 5


def kn_ngram_pairs(
    df: DataFrame, vocab: list[str], arr_col: str = "t",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(…keep, p4, p3, p2, p1, cur) — every token position with its
    4-token left context, '<s>'-padded at the document start. The
    same zero-shuffle transform-with-index as bigram_pairs."""
    mapper = (
        (lambda w: F.when(w.isin(*vocab), w).otherwise(F.lit(UNK)))
        if vocab
        else (lambda w: F.lit(UNK))
    )
    mm = df.withColumn("m", F.transform(arr_col, mapper))
    prev = {
        j: f"CASE WHEN i - {j} < 0 THEN '{BOS}' ELSE m[i - {j}] END"
        for j in (1, 2, 3, 4)
    }
    return mm.select(
        *keep,
        F.explode(
            F.expr(
                "transform(m, (x, i) -> struct("
                f"{prev[4]} AS p4, {prev[3]} AS p3, "
                f"{prev[2]} AS p2, {prev[1]} AS p1, x AS cur))"
            )
        ).alias("g"),
    ).select(*keep, "g.p4", "g.p3", "g.p2", "g.p1", "g.cur")


def train_kn_counts(grams: DataFrame) -> dict[str, DataFrame]:
    """The 9 KN model tables from the training position table:
    g5 raw 5-gram counts; g4/g3/g2/g1 continuation counts (distinct
    left-extensions of each suffix); t5..t2 context (tot, distinct)
    tables; t1 the scalar (tot, distinct) row."""
    g5 = grams.groupBy("p4", "p3", "p2", "p1", "cur").agg(
        F.count(F.lit(1)).alias("c")
    )
    # continuation: g5 rows are distinct 5-grams, so grouping by the
    # k-suffix COUNTS distinct left-extensions; recursing downward
    # keeps the distinct-keys property at every order.
    g4 = g5.groupBy("p3", "p2", "p1", "cur").agg(F.count(F.lit(1)).alias("c"))
    g3 = g4.groupBy("p2", "p1", "cur").agg(F.count(F.lit(1)).alias("c"))
    g2 = g3.groupBy("p1", "cur").agg(F.count(F.lit(1)).alias("c"))
    g1 = g2.groupBy("cur").agg(F.count(F.lit(1)).alias("c"))

    def ctx(g, *cols):
        return g.groupBy(*cols).agg(
            F.sum("c").alias("tot"), F.count(F.lit(1)).alias("d")
        )

    return {
        "g5": g5, "g4": g4, "g3": g3, "g2": g2, "g1": g1,
        "t5": ctx(g5, "p4", "p3", "p2", "p1"),
        "t4": ctx(g4, "p3", "p2", "p1"),
        "t3": ctx(g3, "p2", "p1"),
        "t2": ctx(g2, "p1"),
        "t1": g1.agg(F.sum("c").alias("tot"), F.count(F.lit(1)).alias("d")),
    }


def _maybe_broadcast(df: DataFrame, max_bytes: int = 128 * 1024 * 1024):
    """Broadcast hint only when Catalyst's sizeInBytes estimate is
    bounded — the jaccard_verify/persist_tracked_if_small rule. The
    KN gram tables are ~10^4 rows on the fixtures and on vocab-mapped
    synthetic corpora, but a web-scale 5-gram table grows with the
    corpus; above the threshold the attach falls back to a MERGE-
    hinted (ctx, w)-keyed join — identical results, no broadcast OOM.
    The merge hint matters: without it the planner's own estimate
    (often below autoBroadcastJoinThreshold when stats are stale)
    could re-introduce the broadcast this function just ruled out;
    sort-merge is the one strategy that never materializes a side.
    ``max_bytes=0`` therefore FORCES the keyed plan outright."""
    if max_bytes <= 0:
        return df.hint("merge")
    try:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ))
    except Exception:  # noqa: BLE001 - stats are an optimization only
        return df  # unknown size: let the planner decide
    return F.broadcast(df) if est <= max_bytes else df.hint("merge")


def kn_score(
    grams: DataFrame, model: dict[str, DataFrame], v: int,
    key: str = "doc_id",
    bcast_max_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """(key, n_tok, avg_nll) under the interpolated KN model — model
    tables attached by size-adaptive broadcast, probability assembled
    bottom-up in one expression tree (bit-identical on any engine),
    -ln Q30-quantized per token before the doc sum.

    ``bcast_max_bytes`` is the size-adaptive switch: a gram/context
    table whose Catalyst size estimate exceeds it attaches by a plain
    (ctx, w)-keyed shuffle join instead of a broadcast — the
    production CCNet shape, where a web-vocab 5-gram table is
    corpus-scale and must never visit the driver. Pass 0 to FORCE the
    keyed plan (the t25k parity row: identical values, no broadcast
    anywhere on the gram attaches — proven by the shared t25 oracle
    hash). The probability expression is attach-strategy-independent,
    so both plans are bit-equal by construction."""
    d_ = F.lit(KN_D)
    j = grams
    j = j.join(_maybe_broadcast(model["g5"].withColumnRenamed("c", "c5"),
                                bcast_max_bytes),
               ["p4", "p3", "p2", "p1", "cur"], "left")
    j = j.join(_maybe_broadcast(model["g4"].withColumnRenamed("c", "c4"),
                                bcast_max_bytes),
               ["p3", "p2", "p1", "cur"], "left")
    j = j.join(_maybe_broadcast(model["g3"].withColumnRenamed("c", "c3"),
                                bcast_max_bytes),
               ["p2", "p1", "cur"], "left")
    j = j.join(_maybe_broadcast(model["g2"].withColumnRenamed("c", "c2"),
                                bcast_max_bytes),
               ["p1", "cur"], "left")
    j = j.join(_maybe_broadcast(model["g1"].withColumnRenamed("c", "c1"),
                                bcast_max_bytes),
               ["cur"], "left")
    for k, cols in (("t5", ["p4", "p3", "p2", "p1"]), ("t4", ["p3", "p2", "p1"]),
                    ("t3", ["p2", "p1"]), ("t2", ["p1"])):
        t = model[k].withColumnsRenamed({"tot": f"tot{k[1]}", "d": f"d{k[1]}"})
        j = j.join(_maybe_broadcast(t, bcast_max_bytes), cols, "left")
    t1 = model["t1"].withColumnsRenamed({"tot": "tot1", "d": "d1"})
    j = j.crossJoin(F.broadcast(t1))

    def dbl(c):
        return F.col(c).cast("double")

    p = F.lit(1.0) / F.lit(float(v + 1))  # p_0: uniform base
    for k in (1, 2, 3, 4, 5):
        ck, totk, dk = f"c{k}", f"tot{k}", f"d{k}"
        seen = F.col(totk).isNotNull() & (F.col(totk) > 0)
        pk = (
            F.greatest(F.coalesce(dbl(ck), F.lit(0.0)) - d_, F.lit(0.0))
            / dbl(totk)
            + d_ * dbl(dk) / dbl(totk) * p
        )
        p = F.when(seen, pk).otherwise(p)
    q = F.round(-F.log(p) * F.lit(Q30)).cast("long")
    return (
        j.withColumn("q", q)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("q").alias("s"))
        .select(
            key,
            "n_tok",
            (F.col("s") / (F.col("n_tok") * F.lit(float(Q30)))).alias("avg_nll"),
        )
    )


def build_kn_lm(
    docs: DataFrame,
    path: str,
    arr_col: str = "t",
    train_filter=None,
    v: int = 64,
) -> None:
    """Train the KN 5-gram and persist all 10 tables (vocab + 9 model
    tables) under ``path`` — the bigram build_lm discipline, same
    _DONE marker ordering."""
    from ae_data_integration_spark.operators.ann_index import _finish

    spark = docs.sparkSession
    train = docs.filter(train_filter) if train_filter is not None else docs
    vocab = top_vocab(train, arr_col, v)
    model = train_kn_counts(kn_ngram_pairs(train, vocab, arr_col, keep=()))
    spark.createDataFrame(
        [(w, i) for i, w in enumerate(vocab)], "w string, rank long"
    ).write.mode("overwrite").parquet(f"{path}/vocab")
    for name, tbl in model.items():
        tbl.write.mode("overwrite").parquet(f"{path}/{name}")
    _finish(path, {"v": v, "kind": "kn5_lm"})


def ensure_kn_lm(docs: DataFrame, arr_col: str = "t", train_filter=None,
                 v: int = 64, salt: str = "") -> str:
    """Build-once KN artifact (the ensure_lm cache-key discipline,
    training slice and token column in the key; concurrent-writer
    safe via ann_index._build_once tmp+rename)."""
    from ae_data_integration_spark.operators.ann_index import _build_once

    train_key = "" if train_filter is None else str(train_filter)
    path = lm_dir(
        docs,
        {"v": v, "salt": salt, "kind": "kn5_lm", "arr_col": arr_col,
         "train": train_key},
    )
    return _build_once(
        path, lambda p: build_kn_lm(docs, p, arr_col, train_filter, v)
    )


def kn_serve_scored(
    docs: DataFrame, path: str, arr_col: str = "t", key: str = "doc_id",
    bcast_max_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """(key, n_tok, avg_nll) scored against the STORED KN artifact.
    ``bcast_max_bytes`` threads through to kn_score's size-adaptive
    gram-table attach (0 forces the keyed merge-join plan)."""
    import json
    import os

    spark = docs.sparkSession
    with open(os.path.join(path, "meta.json")) as fh:
        v = int(json.load(fh)["v"])
    vocab = [
        r["w"]
        for r in spark.read.parquet(f"{path}/vocab").orderBy("rank").collect()
    ]
    model = {
        name: spark.read.parquet(f"{path}/{name}")
        for name in ("g5", "g4", "g3", "g2", "g1", "t5", "t4", "t3", "t2", "t1")
    }
    grams = kn_ngram_pairs(docs, vocab, arr_col, keep=(key,))
    return kn_score(grams, model, v, key, bcast_max_bytes=bcast_max_bytes)
