"""Round-11 surface: regression pins for the round-10 advisor
findings (ADVICE.md) — order-statistics under leading-key ties that
straddle partition boundaries, the manifest-driven ANN serve set's
crash-safety, and the LM artifact cache key covering the training
slice."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.ranks import order_statistics
from tests.conftest import SF_CORRECT, SF_SMOKE


# --- ranks: per-partition minimum must be the struct min ----------------------


def test_order_statistics_survives_leading_key_ties_across_partitions(spark):
    """ADVICE r10 #1: with heavy ties on the leading sort key
    straddling partition boundaries, the old per-column-minima sanity
    check saw (v_min, k_min) tuples that inverted across partitions
    (a later partition holding a SMALLER tie-break under a LARGER
    leading key) and raised a spurious AssertionError. The check must
    compare true lexicographic minimum rows (struct min)."""
    # 2000 rows tied on v=1 (k = 0..1999) span several of the 8 test
    # partitions; one (v=2, k=1) row lands in the LAST of them, making
    # that partition's per-column k-min (1) smaller than its
    # predecessors' — the advisor's exact inversion.
    rows = [(1, k) for k in range(2000)] + [(2, 1)]
    df = spark.createDataFrame(rows, "v int, k int").repartition(8)
    want = sorted(rows)
    got, n = order_statistics(df, ["v", "k"], [1, 1000, 2001])
    assert n == 2001
    assert [(r["v"], r["k"]) for r in got] == [want[0], want[999], want[2000]]


# --- ann_index: manifest-driven serve set -------------------------------------


def _pq_index(spark, tmp_path, monkeypatch):
    from ae_data_integration_spark.catalog import similarity_q as sq
    from ae_data_integration_spark.operators.ann_index import (
        append_to_pq_index,
        build_pq_index,
        index_dir,
    )
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    e = table(spark, SF_SMOKE, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "pq", "m": sq._S6_M, "k": sq._S6_K, "salt": "pqi",
              "train": "mod5"}
    path = index_dir(base, "pq", params)
    build_pq_index(base, path, m=sq._S6_M, k=sq._S6_K, salt="pqi")
    append_to_pq_index(batch, path, tag="b1")
    return e, base, batch, path


def test_code_dirs_fails_loudly_when_base_missing(spark, tmp_path, monkeypatch):
    """ADVICE r10 #2a: a torn pre-manifest layout (increments present,
    base 'codes' dir gone) must raise, not silently serve
    increments-only results."""
    from ae_data_integration_spark.operators.ann_index import _code_dirs

    _, _, _, path = _pq_index(spark, tmp_path, monkeypatch)
    shutil.rmtree(os.path.join(path, "codes"))
    with pytest.raises(FileNotFoundError, match="no base 'codes'"):
        _code_dirs(path)


def test_code_dirs_skips_folded_tags_pre_manifest(spark, tmp_path, monkeypatch):
    """ADVICE r10 #2b: an increment whose tag is recorded in
    _merged_tags.json was already folded into the base — scanning it
    again would duplicate code rows. The pre-manifest glob must skip
    it."""
    from ae_data_integration_spark.operators.ann_index import _code_dirs

    e, _, _, path = _pq_index(spark, tmp_path, monkeypatch)
    # simulate: crash AFTER the base was replaced by the merged union
    # but BEFORE the increment dirs were deleted (old-style layout)
    merged = spark.read.parquet(*_code_dirs(path))
    tmp_merged = str(tmp_path / "merged")
    merged.write.mode("overwrite").parquet(tmp_merged)
    shutil.rmtree(os.path.join(path, "codes"))
    shutil.move(tmp_merged, os.path.join(path, "codes"))
    with open(os.path.join(path, "_merged_tags.json"), "w") as fh:
        json.dump(["b1"], fh)
    dirs = _code_dirs(path)
    assert dirs == [os.path.join(path, "codes")]
    union = spark.read.parquet(*dirs)
    assert union.select("id").distinct().count() == union.count() == e.count()


def test_compaction_manifest_flip_registers_appends_and_sweeps_garbage(
    spark, tmp_path, monkeypatch
):
    """The compaction commit point is ONE atomic manifest replace:
    after it, _code_dirs serves exactly the versioned merged table; a
    later append registers its increment in the manifest; unreferenced
    garbage dirs (a crash between flip and cleanup) are invisible to
    serving and swept by the next compaction."""
    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        append_to_pq_index,
        compact_pq_index,
    )

    e, _, batch, path = _pq_index(spark, tmp_path, monkeypatch)
    assert compact_pq_index(spark, path) == 1
    manifest = os.path.join(path, "_serveset.json")
    assert os.path.exists(manifest)
    with open(manifest) as fh:
        assert json.load(fh) == ["base_v0001"]
    assert _code_dirs(path) == [os.path.join(path, "base_v0001")]
    # append under a manifest: the increment must be registered
    append_to_pq_index(batch, path, tag="b2")
    with open(manifest) as fh:
        assert json.load(fh) == ["base_v0001", "codes_b2"]
    assert len(_code_dirs(path)) == 2
    # garbage dir (simulated torn cleanup) is ignored and later swept
    os.makedirs(os.path.join(path, "codes_orphan"))
    assert len(_code_dirs(path)) == 2
    assert compact_pq_index(spark, path) == 1  # folds codes_b2
    assert _code_dirs(path) == [os.path.join(path, "base_v0002")]
    assert not os.path.exists(os.path.join(path, "codes_orphan"))
    union = spark.read.parquet(*_code_dirs(path))
    # corpus = base (4/5) + b1 + b2 appends; b2 re-covers the mod-5
    # slice b1 already added, idempotently (same ids, same codes)
    assert union.select("id").distinct().count() == e.count()


def test_compaction_crash_before_flip_serves_old_layout(
    spark, tmp_path, monkeypatch
):
    """A merged table fully written but never committed (no manifest)
    must be unreachable: base_v* names never match the pre-manifest
    glob, so serving still sees codes + codes_b1."""
    from ae_data_integration_spark.operators.ann_index import _code_dirs

    e, _, _, path = _pq_index(spark, tmp_path, monkeypatch)
    dirs0 = _code_dirs(path)
    spark.read.parquet(*dirs0).write.mode("overwrite").parquet(
        os.path.join(path, "base_v0001")
    )  # the crash: merged written, manifest never replaced
    assert _code_dirs(path) == dirs0


# --- lm: cache key covers the training slice ----------------------------------


def test_ensure_lm_keys_on_train_slice_and_arr_col(spark, tmp_path, monkeypatch):
    """ADVICE r10 #3: two LMs over the same documents with different
    reference slices (or token columns) must content-address to
    DIFFERENT artifact directories — never silently serve the other
    caller's model."""
    from ae_data_integration_spark.operators.lm import ensure_lm
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    toks = table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), r"\s+").alias("t")
    )
    p_en = ensure_lm(toks, "t", train_filter=(F.col("lang") == "en"), v=16)
    p_all = ensure_lm(toks, "t", train_filter=None, v=16)
    p_de = ensure_lm(toks, "t", train_filter=(F.col("lang") == "de"), v=16)
    assert len({p_en, p_all, p_de}) == 3
    # same slice again: cache hit, same path
    assert ensure_lm(toks, "t", train_filter=(F.col("lang") == "en"), v=16) == p_en


# --- pipe9: exact-dup provenance (the fixture has no cross-corpus exact dups) -


def test_pipe9_exact_drop_provenance_on_synthetic_corpus(spark, tmp_path):
    """The fixture batch contains no exact duplicate of a corpus doc,
    so pipe9's n_exact_dup column is 0 everywhere at every SF — this
    synthetic corpus pins the exact leg by value: one batch doc is a
    byte-copy of a corpus doc (dropped 'exact'), one is a light edit
    of a corpus doc (dropped 'near'), the rest are novel (accepted)."""
    from ae_data_integration_spark.catalog.lifecycle_q import (
        pipe9_corpus_lifecycle,
    )

    base_txt = "the quick brown fox jumps over the lazy dog " * 6
    rows = []
    # corpus: doc_ids not divisible by 5
    for i in [1, 2, 3, 4, 6, 7, 8, 9]:
        rows.append((i, f"corpus document {i} " + base_txt + f"tail {i}",
                     "en", "srcA", 100))
    # batch: 5 = exact copy of corpus doc 1; 10 = near-copy of corpus
    # doc 2 (one token changed); 15/20 novel
    rows.append((5, rows[0][1], "en", "srcA", 100))
    near_txt = rows[1][1].replace("tail 2", "tail x")
    rows.append((10, near_txt, "en", "srcA", 100))
    rows.append((15, "completely novel content alpha beta gamma delta " * 8,
                 "en", "srcB", 100))
    rows.append((20, "another unrelated text epsilon zeta eta theta " * 8,
                 "en", "srcB", 100))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "sfx")
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    # embeddings: deterministic 64-dim vectors for every doc id
    emb = docs.select(
        docs.doc_id.alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), i -> CAST(("
            "  CAST(conv(substr(md5(CAST(doc_id AS STRING) || '_' ||"
            "       CAST(i AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1000"
            ") AS DOUBLE) / 1000.0)"
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    import os

    os.environ["SPARK_GRAFT_INDEX_DIR"] = str(tmp_path / "ann")
    try:
        rep = {
            r["source"]: r.asDict()
            for r in pipe9_corpus_lifecycle(spark, sf).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_INDEX_DIR"]
    assert rep["srcA"]["n_arrived"] == 2
    assert rep["srcA"]["n_exact_dup"] == 1   # doc 5
    assert rep["srcA"]["n_near_dup"] == 1    # doc 10
    assert rep["srcA"]["n_accepted"] == 0
    assert rep["srcB"]["n_arrived"] == 2
    assert rep["srcB"]["n_exact_dup"] == 0
    assert rep["srcB"]["n_near_dup"] == 0
    assert rep["srcB"]["n_accepted"] == 2
    assert (rep["srcB"]["n_head"] + rep["srcB"]["n_middle"]
            + rep["srcB"]["n_tail"]) == 2


# --- s6d: the rebuild trigger fires on a drifted append ------------------------


def test_pq_residual_report_detects_drifted_append(spark, tmp_path, monkeypatch):
    """Appends are encoded under FROZEN codebooks, so a batch from a
    drifted distribution degrades quantization silently — the serve
    plan is unchanged (same code-table scan), only the residual
    energy shows it. Pin both sides of the trigger rule: an
    IN-distribution append stays under appended/base < 1.5, a SHIFTED
    append (vectors offset far outside the training support) crosses
    it."""
    from ae_data_integration_spark.catalog.similarity_q import (
        pq_residual_report,
    )
    from ae_data_integration_spark.operators.ann_index import (
        append_to_pq_index,
        build_pq_index,
        index_dir,
    )
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    e = table(spark, SF_SMOKE, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)

    def ratio(batch_df):
        p = index_dir(base, "pq", {"salt": "pqd", "case": str(batch_df)[:40]})
        build_pq_index(base, p, m=8, k=32, salt="pqd")
        append_to_pq_index(batch_df, p, tag="b")
        seg = F.when(F.col("id") % 5 == 0, F.lit("appended")).otherwise(
            F.lit("base")
        )
        all_vecs = base.unionByName(batch_df)
        rep = {
            r["segment"]: r["mean_residual_energy"]
            for r in pq_residual_report(spark, all_vecs, p, seg).collect()
        }
        return rep["appended"] / rep["base"]

    in_dist = ratio(batch)
    shifted = ratio(
        batch.select(
            "vec_id",
            F.expr("transform(embedding, x -> x + 5.0)").alias("embedding"),
            "label",
        )
    )
    assert in_dist < 1.5, f"in-distribution append tripped the trigger: {in_dist}"
    assert shifted > 1.5, f"drifted append did not trip the trigger: {shifted}"
    assert shifted > 3 * in_dist  # the signal is unambiguous, not marginal


# --- t25: KN 5-gram vs an independent pure-Python reference -------------------


def _kn_ref_scores(train_seqs, score_seqs, vocab, v, d=0.75):
    """Interpolated Kneser-Ney order-5 (Chen & Goodman 1999) computed
    independently with dict arithmetic — the golden for kn_score."""
    import math
    from collections import Counter

    vs = set(vocab)

    def grams(seq):
        m = [w if w in vs else "<unk>" for w in seq]
        out = []
        for i, cur in enumerate(m):
            ctx = tuple(
                "<s>" if i - j < 0 else m[i - j] for j in (4, 3, 2, 1)
            )
            out.append((*ctx, cur))
        return out

    g = {5: Counter()}
    for seq in train_seqs:
        g[5].update(grams(seq))
    for k in (4, 3, 2, 1):
        g[k] = Counter()
        for key in g[k + 1]:  # keys at order k+1 have length k+1
            g[k][key[1:]] += 1
    tot, dis = {}, {}
    for k in (5, 4, 3, 2, 1):
        tot[k], dis[k] = Counter(), Counter()
        for key, c in g[k].items():
            tot[k][key[:-1]] += c
            dis[k][key[:-1]] += 1

    def prob(key5):
        p = 1.0 / (v + 1)
        for k in (1, 2, 3, 4, 5):
            key = key5[5 - k:]
            ctx = key[:-1]
            t = tot[k].get(ctx, 0)
            if t > 0:
                p = max(g[k].get(key, 0) - d, 0.0) / t + d * dis[k][ctx] / t * p
        return p

    q30 = 1 << 30
    out = []
    for seq in score_seqs:
        qs = [round(-math.log(prob(k5)) * q30) for k5 in grams(seq)]
        out.append((len(qs), sum(qs) / (len(qs) * float(q30))))
    return out


def test_kn5_matches_pure_python_reference(spark):
    """The engine's KN-5 (zero-shuffle context map + broadcast count
    tables + one expression tree) must reproduce an independent
    dict-arithmetic implementation of the same formula on a corpus
    crafted to exercise every backoff level: seen 5-grams, seen-only-
    lower-order suffixes, OOV tokens, and documents shorter than the
    order."""
    from ae_data_integration_spark.operators.lm import (
        kn_ngram_pairs,
        kn_score,
        train_kn_counts,
    )

    train = [
        "the cat sat on the mat".split(),
        "the cat sat on the hat".split(),
        "a dog sat on a log".split(),
        "the dog ran to the mat".split(),
    ]
    score = [
        "the cat sat on the mat".split(),       # fully seen 5-grams
        "the dog sat on the mat".split(),       # mixed backoff
        "zebra the cat xylophone".split(),      # OOV -> <unk>
        "mat".split(),                          # shorter than order
        "on on on on on on on on".split(),      # repetition
    ]
    vocab = ["the", "cat", "sat", "on", "mat", "hat", "a", "dog",
             "log", "ran", "to"]
    v = 16  # declared budget > realized vocab (the t23 sharp edge)
    toks_train = spark.createDataFrame(
        [(i, seq) for i, seq in enumerate(train)],
        "doc_id long, t array<string>",
    )
    toks_score = spark.createDataFrame(
        [(i, seq) for i, seq in enumerate(score)],
        "doc_id long, t array<string>",
    )
    model = train_kn_counts(kn_ngram_pairs(toks_train, vocab, "t"))
    got = {
        r["doc_id"]: (r["n_tok"], r["avg_nll"])
        for r in kn_score(
            kn_ngram_pairs(toks_score, vocab, "t", keep=("doc_id",)),
            model, v,
        ).collect()
    }
    want = _kn_ref_scores(train, score, vocab, v)
    assert set(got) == set(range(len(score)))
    for i, (n_tok, nll) in enumerate(want):
        assert got[i][0] == n_tok
        assert abs(got[i][1] - nll) < 5e-9, (i, got[i], (n_tok, nll))
    # sanity: a fully-seen doc scores better than the OOV doc
    assert got[0][1] < got[2][1]


def test_pipe5c_bloom_gate_equals_pipe5_exactly(spark):
    """The Bloom runtime filter must be invisible in the result: no
    false negatives means the gated corpus fp set contains every fp
    the batch could match, so survivors are bit-identical to pipe5."""
    from ae_data_integration_spark.catalog import load_all

    reg = load_all()
    base = reg["pipe5_incremental_dedup"].fn(spark, SF_CORRECT).collect()
    gated = reg["pipe5c_bloom_gate"].fn(spark, SF_CORRECT).collect()
    assert [tuple(r) for r in gated] == [tuple(r) for r in base]
    assert len(base) > 0


def test_t26_logreg_training_learns(spark):
    """GD quality contract for t26: after 3 iterations the learned
    weights must (a) strictly reduce the logistic loss below the
    w=0 starting point ln 2, and (b) separate the classes — mean
    score of en docs above mean score of non-en docs."""
    import math

    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog import load_all
    from ae_data_integration_spark.functions.portable import Q30
    from ae_data_integration_spark.functions.text import tokens

    w = {
        r["bucket"]: r["w_q"]
        for r in load_all()["t26_logreg_train"].fn(spark, SF_SMOKE).collect()
    }
    assert any(v != 0 for v in w.values())

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tok = d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long") % 64
    )
    rows = (
        tok.select("doc_id", "lang", bucket.alias("b")).distinct().collect()
    )
    s: dict[int, float] = {}
    lang: dict[int, str] = {}
    for r in rows:  # binary presence features, matching the operator
        s[r["doc_id"]] = s.get(r["doc_id"], 0.0) + w[r["b"]] / Q30
        lang[r["doc_id"]] = r["lang"]
    losses, en_scores, other_scores = [], [], []
    for doc, sc in s.items():
        p = 1.0 / (1.0 + math.exp(-sc))
        yd = 1.0 if lang[doc] == "en" else 0.0
        p = min(max(p, 1e-12), 1 - 1e-12)
        losses.append(-(yd * math.log(p) + (1 - yd) * math.log(1 - p)))
        (en_scores if yd else other_scores).append(sc)
    assert sum(losses) / len(losses) < math.log(2.0)
    assert sum(en_scores) / len(en_scores) > sum(other_scores) / len(
        other_scores
    )
