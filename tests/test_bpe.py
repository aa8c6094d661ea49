"""BPE vocabulary induction + tokenizer application.

Golden: a pure-Python BPE trainer (classic Sennrich-style word-count
loop with the same tie-break) must reproduce the distributed merge
table exactly on the smoke corpus; merge-apply semantics (greedy
leftmost, non-overlapping, multi-char symbols) pinned on crafted
words; the gaps-and-islands streak query pinned on crafted events.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

from pyspark.sql import functions as F

from ae_data_integration_spark.operators.bpe import (
    apply_merge,
    encode_with_merges,
    train_bpe,
    word_vocab,
)
from ae_data_integration_spark.operators.bpe_batched import train_bpe_batched
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE

_TOKEN_RE = re.compile(r"^[a-z]+$")


def _py_word_counts(sf_dir: str) -> Counter:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM read_parquet(?)", [f"{sf_dir}/documents.parquet"]
    ).fetchall()
    con.close()
    c: Counter = Counter()
    for (text,) in rows:
        for w in re.split(r"\s+", text.lower()):
            if w and _TOKEN_RE.match(w):
                c[w] += 1
    return c


def _py_train(counts: Counter, rounds: int) -> list[tuple]:
    """Classic BPE trainer: words as symbol tuples, argmax pair by
    (count DESC, left ASC, right ASC), greedy leftmost merge."""
    vocab = {tuple(w): n for w, n in counts.items()}
    merges = []
    for rank in range(1, rounds + 1):
        pc: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        new = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        vocab = new
    return merges


def test_train_bpe_matches_python_golden(spark):
    docs = table(spark, SF_SMOKE, "documents")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
        for r in train_bpe(spark, docs, rounds=8).orderBy("rank").collect()
    ]
    want = _py_train(_py_word_counts(SF_SMOKE), rounds=8)
    assert got == want
    counts = [g[4] for g in got]
    assert counts == sorted(counts, reverse=True)  # provable BPE invariant


def test_train_bpe_batched_exact_equals_sequential(spark):
    """The headline equivalence claim: the exact-mode batched trainer's
    merge table is BIT-IDENTICAL to sequential greedy BPE — here at 40
    rounds on the fixture corpus, against the pure-Python trainer —
    while issuing fewer driver jobs."""
    docs = table(spark, SF_SMOKE, "documents")
    stats: dict = {}
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
        for r in train_bpe_batched(spark, docs, rounds=40, stats=stats)
        .orderBy("rank")
        .collect()
    ]
    want = _py_train(_py_word_counts(SF_SMOKE), rounds=40)
    assert got == want
    assert stats["n_merges"] == 40
    assert stats["n_jobs"] < stats["n_merges"], stats  # actually batched
    assert sum(stats["batch_sizes"]) == stats["n_merges"]


def _py_apply(vocab: dict, a: str, b: str) -> dict:
    new: dict = {}
    for syms, n in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        new[tuple(out)] = new.get(tuple(out), 0) + n
    return new


def test_train_bpe_batched_production_counts_are_true(spark):
    """exact=False (skip-conflicts, the production throughput mode)
    may ORDER merges differently from sequential greedy, but every
    recorded count must be the pair's TRUE count at its apply time —
    replayed here merge-by-merge in pure Python — and the job count
    must be a real batch win (merges/job > 5 on this corpus)."""
    docs = table(spark, SF_SMOKE, "documents")
    stats: dict = {}
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
        for r in train_bpe_batched(
            spark, docs, rounds=40, exact=False, stats=stats
        )
        .orderBy("rank")
        .collect()
    ]
    assert [g[0] for g in got] == list(range(1, 41))
    vocab = {tuple(w): n for w, n in _py_word_counts(SF_SMOKE).items()}
    for rank, a, b, merged, cnt in got:
        pc = Counter()
        for syms, n in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += n
        assert pc[(a, b)] == cnt, f"rank {rank}: recorded {cnt} true {pc[(a, b)]}"
        assert merged == a + b
        vocab = _py_apply(vocab, a, b)
    assert stats["n_merges"] / stats["n_jobs"] > 5, stats


def test_train_bpe_batched_production_equals_sequential_conflict_free(spark):
    """On a corpus whose frequent pairs never share symbols, the
    production mode IS sequential greedy (the verdict's conflict-free
    equivalence contract)."""
    words = [("ab", 50), ("cd", 45), ("ef", 40), ("gh", 35), ("ij", 30),
             ("kl", 25), ("mn", 20), ("op", 15)]
    docs = _crafted_docs(spark, words)
    stats: dict = {}
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
        for r in train_bpe_batched(
            spark, docs, rounds=8, exact=False, stats=stats
        )
        .orderBy("rank")
        .collect()
    ]
    want = _py_train(Counter(dict(words)), rounds=8)
    assert got == want
    assert stats["n_jobs"] == 1  # all 8 disjoint merges in ONE job


def _crafted_docs(spark, words: list[tuple[str, int]]):
    rows = [(" ".join([w] * n),) for w, n in words]
    return spark.createDataFrame(rows, "text string")


@pytest.mark.parametrize(
    "words",
    [
        # tie at the truncation boundary: merging (a,b) creates
        # (x,ab) with count == (c,d)'s — naive batching would merge
        # (c,d) while sequential prefers (ab? no: exercises the
        # strict-count truncation path either way
        [("xab", 50), ("cd", 60)],
        # everything ties — batch must degenerate to sequential
        [("ab", 10), ("cd", 10), ("ef", 10), ("gh", 10)],
        # chain conflicts: (a,b) and (b,c) share a symbol
        [("abc", 30), ("bc", 20), ("de", 25)],
        # deep chain through multi-char symbols (t,h)->(th,e)->(the,r)
        [("thether", 40), ("other", 15), ("in", 35)],
        # single repeated char: overlap semantics under batching
        [("aaaa", 20), ("bb", 20), ("cc", 19)],
    ],
)
def test_train_bpe_batched_equals_sequential_crafted(spark, words):
    docs = _crafted_docs(spark, words)
    counts = Counter(dict(words))
    for rounds in (3, 6):
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
            for r in train_bpe_batched(spark, docs, rounds=rounds, max_batch=8)
            .orderBy("rank")
            .collect()
        ]
        want = _py_train(counts, rounds=rounds)
        assert got == want, f"rounds={rounds} words={words}"


@pytest.mark.parametrize(
    "word,merges,expected",
    [
        # greedy leftmost with overlap: aaaa -> [aa, aa]; aaa -> [aa, a]
        ("aaaa", [("a", "a")], ["aa", "aa"]),
        ("aaa", [("a", "a")], ["aa", "a"]),
        # chained multi-char merge: t+h then th+e
        ("the", [("t", "h"), ("th", "e")], ["the"]),
        ("thether", [("t", "h"), ("th", "e")], ["the", "the", "r"]),
        # a merge must not fire inside an already-merged symbol:
        # after (a,b)->ab, pair (b,c) no longer exists in "abc"
        ("abc", [("a", "b"), ("b", "c")], ["ab", "c"]),
    ],
)
def test_merge_apply_semantics(spark, word, merges, expected):
    df = spark.createDataFrame([(word, 1)], "tok string, n int")
    out = encode_with_merges(df, merges).collect()[0]["subwords"]
    assert out == expected


def test_apply_merge_is_literal_not_regex(spark):
    # symbols pass through F.replace (literal), so nothing needs
    # regex escaping even if a symbol were a metachar-lookalike.
    df = spark.createDataFrame([("<a><b><a><b>",)], "rep string")
    out = df.select(apply_merge(F.col("rep"), "a", "b").alias("r")).collect()
    assert out[0]["r"] == "<ab><ab>"


def test_word_vocab_alpha_only(spark):
    df = spark.createDataFrame(
        [("the cat the cat42 CAT hat!",)], "text string"
    )
    v = {r["tok"]: r["n"] for r in word_vocab(df).collect()}
    # "cat42" and "hat!" fail ^[a-z]+$; "CAT" lowercases to cat
    assert v == {"the": 2, "cat": 2}


def test_e10_streaks_crafted(spark, tmp_path):
    from ae_data_integration_spark.catalog import load_all

    q = load_all()["e10_activity_streaks"]
    # user 1: days 0,1,2 then 5,6 -> longest 3 starting day 0,
    #         2 streaks, 5 active days (same-day dups collapse)
    # user 2: day 10 only
    us = 86400000000
    rows = [
        (1, 0), (1, 1), (1, 1), (1, 2), (1, 5), (1, 6),
        (2, 10), (2, 10),
    ]
    spark.createDataFrame(
        [(u, d * us + 123) for u, d in rows], "user_id long, us long"
    ).select("user_id", F.timestamp_micros("us").alias("ts")).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: (
            r["n_active_days"], r["n_streaks"],
            r["longest_streak"], r["streak_start_day"],
        )
        for r in q.fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: (5, 2, 3, 0), 2: (1, 1, 1, 10)}


def test_e11_rolling_dau_crafted(spark, tmp_path):
    from ae_data_integration_spark.catalog import load_all

    q = load_all()["e11_rolling_dau"]
    us = 86400000000
    # user 1 active days {0, 3}; user 2 active day {3}.
    rows = [(1, 0), (1, 3), (2, 3)]
    spark.createDataFrame(
        [(u, d * us + 5) for u, d in rows], "user_id long, us long"
    ).select("user_id", F.timestamp_micros("us").alias("ts")).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["win_day"]: r["dau_7d"] for r in q.fn(spark, str(tmp_path)).collect()}
    # window day d covers activity days [d-6, d]: days 0-2 see only
    # user 1's day-0 activity; day 3 sees days {0, 3} -> users
    # {1, 2}; window days are capped at the max active day (3).
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}
