"""Text-analysis functions for training-data pipelines.

All JVM-side (regex / array HOFs) — no Python UDFs. These extend the
reference's string surface (SURVEY §2.2 P2/P8: split, regexp_replace,
dict-map-as-broadcast-join) into the operators an LLM-data pipeline
needs: tokenization, token counting, quality scoring, language ID,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Tiny per-language marker lists (public common stopwords). Used by
# the broadcast-join language-ID heuristic — the same pattern as the
# reference's 6-row label dict (Data_prep.py:86-89 → broadcast dim).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
    "zh": ["的", "是", "了", "在", "和", "有", "不", "人", "这", "中"],
}


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization; empty strings filtered."""
    t = F.col(text) if isinstance(text, str) else text
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# ASCII punctuation as an explicit character class — Java regex and
# RE2 (DuckDB) agree on it byte-for-byte, unlike \p{P} whose Unicode
# table version can drift between engines.
ASCII_PUNCT = r"[!-/:-@\[-`{-~]"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Cheap BPE-like token estimate: word-chunks + digits + punct,
    long words counted as ceil(len/4) subword units. Returns double
    (engines disagree on double→int cast rounding; callers keep it)."""
    t = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(F.lower(t), r"[^\p{L}\p{N}]+"), lambda x: x != "")
    sub = F.aggregate(
        words,
        F.lit(0.0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("double"),
    )
    punct = F.length(t) - F.length(F.regexp_replace(t, ASCII_PUNCT, ""))
    return sub + punct.cast("double")


def punct_ratio(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.length(t), F.lit(1))
    return (F.length(t) - F.length(F.regexp_replace(t, ASCII_PUNCT, ""))) / n


def mean_word_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0.0), lambda a, w: a + F.length(w).cast("double"))
    return total / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = F.array([F.lit(w) for w in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: rewards moderate
    length, words of plausible length, low punctuation density."""
    t = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(t).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    wl = mean_word_len(t)
    wl_score = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    p_score = F.lit(1.0) - F.least(punct_ratio(t) * F.lit(4.0), F.lit(1.0))
    return (len_score + wl_score + p_score) / F.lit(3.0)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 over whitespace/case-normalized text
    (exact-dup key; the rolling-hash winnowing variant is in
    dedup.simhash)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(t), r"\s+", " ")))


def word_ngrams_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) from a MATERIALIZED token
    array column — the dedup unit for n-gram Jaccard. Documents with
    fewer than n tokens contribute one ngram: the whole token sequence
    (keeps sets non-empty and is portable — the SQL twin uses the same
    CASE).

    Takes a column, not an expression: HOF lambdas run interpreted
    with NO common-subexpression elimination, so an inline tokenizer
    here would re-split the full text once per element_at (measured
    6× on the d5 profile). Land ``tokens(text)`` in its own projection
    first."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    )


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Convenience form over raw text — fine for ad-hoc use; hot paths
    should materialize tokens first (see word_ngrams_from_tokens)."""
    return word_ngrams_from_tokens(tokens(text), n)


ROLL_B = 131  # polynomial base; h < 2^48 so B*h + t < 2^63 (no overflow)


def rolling_fingerprint(text: Column | str) -> Column:
    """Rabin-Karp-style document fingerprint: left fold of
    h = (h·B + md5_48(token)) mod P over the token stream. Order-
    SENSITIVE (unlike a bag-of-words hash) and engine-portable —
    integer arithmetic both engines compute identically. Empty
    documents map to 0."""
    from ae_data_integration_spark.functions.hashing import MINHASH_P

    toks = tokens(text)
    th = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long")
    )
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLL_B) + h) % F.lit(MINHASH_P),
    )


def lang_marker_table(spark: SparkSession) -> DataFrame:
    """(lang, word) dimension for the broadcast-join language ID."""
    rows = [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws]
    return spark.createDataFrame(rows, "lang_pred string, marker string")


def contamination_hits(
    corpus: "DataFrame",
    eval_docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
):
    """Benchmark decontamination screen: per corpus document, how many
    of its distinct word n-grams also occur anywhere in the eval set.

    The standard training-data hygiene step (strip eval-set overlap
    before training; production pipelines use n=8..13 — n is a knob,
    sized here to the synthetic corpus's short texts). Scale shape:
    the eval set is benchmarks — always tiny relative to a 100 TB
    corpus — so its distinct n-gram set BROADCASTS; the corpus side is
    a map (per-row distinct n-grams, already deduped in-array) + a
    broadcast-hash semi join + one map-side-combinable count per doc.
    No corpus-sized shuffle anywhere.

    Returns (id, n_overlapping) for contaminated documents only
    (n_overlapping >= 1); the keep-list is an anti-join against it.
    """

    def grams(df):
        return df.select(
            F.col(id_col), tokens(text_col).alias("_t")
        ).select(
            id_col, F.explode(word_ngrams_from_tokens("_t", n)).alias("ngram")
        )

    eval_grams = grams(eval_docs).select("ngram").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(eval_grams), "ngram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )
