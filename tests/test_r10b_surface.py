"""Round-10 second-wave surface: distributed exact order statistics
(functions/ranks.py), the t23 perplexity filter's tercile semantics,
s8's coarse-to-fine recall, t24 fertility invariants, and dq4's
probability-mass conservation.

The value hashes are pinned by the parity harness; these tests pin
the properties the hashes can't see (order-statistic correctness
under any partitioning, recall floors, mass conservation).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import REGISTRY, load_all, resolve
from ae_data_integration_spark.functions.ranks import order_statistics
from tests.conftest import SF_SMOKE

load_all()


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[resolve(name)].fn(spark, sf)


# --- order_statistics --------------------------------------------------------


def test_order_statistics_matches_sorted_golden(spark):
    """Every rank of a shuffled 997-row frame equals the Python-sorted
    golden, under an adversarial 32-way repartition (the helper must
    be partition-count independent)."""
    vals = [((i * 7919) % 997, i) for i in range(997)]  # distinct keys
    df = spark.createDataFrame(vals, "v long, k long").repartition(32)
    want = sorted(vals)
    ranks = [1, 2, 332, 333, 334, 665, 666, 997]
    rows, n = order_statistics(df, ["v", "k"], ranks)
    assert n == 997
    assert [(r["v"], r["k"]) for r in rows] == [want[rk - 1] for rk in ranks]


def test_order_statistics_callable_ranks_and_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    rows, n = order_statistics(df, ["v"], lambda n: [math.ceil(n / 3)])
    assert n == 10 and rows[0]["v"] == 3  # ceil(10/3)=4th of 0..9
    with pytest.raises(IndexError):
        order_statistics(df, ["v"], [11])


# --- t23 perplexity filter ---------------------------------------------------


@pytest.fixture(scope="module")
def t23(spark):
    return _run(spark, "t23_lm_perplexity").collect()


def test_t23_tercile_sizes_follow_ntile_rule(t23):
    n = len(t23)
    sizes = {b: sum(1 for r in t23 if r["bucket"] == b)
             for b in ("head", "middle", "tail")}
    assert sizes["head"] == math.ceil(n / 3)
    assert sizes["head"] + sizes["middle"] == math.ceil(2 * n / 3)
    assert sum(sizes.values()) == n


def test_t23_buckets_are_ordered_by_nll(t23):
    """max(head) <= min(middle) <= ... on (avg_nll, doc_id) order —
    the buckets tile the total order."""
    key = {r["doc_id"]: (r["avg_nll"], r["doc_id"]) for r in t23}
    hi_head = max(key[r["doc_id"]] for r in t23 if r["bucket"] == "head")
    lo_mid = min(key[r["doc_id"]] for r in t23 if r["bucket"] == "middle")
    hi_mid = max(key[r["doc_id"]] for r in t23 if r["bucket"] == "middle")
    lo_tail = min(key[r["doc_id"]] for r in t23 if r["bucket"] == "tail")
    assert hi_head < lo_mid < hi_mid < lo_tail


def test_t23_train_domain_scores_lower_nll(spark, t23):
    """The LM is trained on lang='en': English docs must have lower
    mean NLL than the rest of the corpus (the CCNet discrimination
    the filter exists for), and the head bucket must be majority-en."""
    from ae_data_integration_spark.tables import table

    lang = {
        r["doc_id"]: r["lang"]
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    }
    en = [r["avg_nll"] for r in t23 if lang[r["doc_id"]] == "en"]
    other = [r["avg_nll"] for r in t23 if lang[r["doc_id"]] != "en"]
    assert sum(en) / len(en) < sum(other) / len(other)
    head = [r for r in t23 if r["bucket"] == "head"]
    assert sum(1 for r in head if lang[r["doc_id"]] == "en") > len(head) / 2


def test_t23_avg_nll_is_plausible_bigram_nll(t23):
    """NLL of a 65-symbol add-1 bigram model lies in (0, ln(huge)):
    every value positive and below ln(2^20) — a sanity corridor that
    catches sign errors and un-normalized probabilities."""
    for r in t23:
        assert 0.0 < r["avg_nll"] < 14.0
        assert r["n_tok"] > 0


# --- s8 truncated rerank -----------------------------------------------------


def test_s8_recall_vs_exact_and_exact_scores(spark):
    """Final top-10 overlaps brute-force top-10 (same probes) at >=
    0.8 recall, and every returned cosine equals the exact full-width
    cosine brute force computed for that same (q, n) pair."""
    s8 = _run(spark, "s8_truncated_rerank").collect()
    exact = _run(spark, "s1b_ann_fixed_probes").collect()
    truth = {(r["q_id"], r["n_id"]) for r in exact}
    got = {(r["q_id"], r["n_id"]) for r in s8}
    assert len(got & truth) / len(truth) >= 0.8
    exact_cos = {(r["q_id"], r["n_id"]): r["cos"] for r in exact}
    for r in s8:
        k = (r["q_id"], r["n_id"])
        if k in exact_cos:
            assert r["cos"] == exact_cos[k]  # bit-equal, same op sequence


def test_s8_shortlist_bounds_output(spark):
    s8 = _run(spark, "s8_truncated_rerank").collect()
    per_q = {}
    for r in s8:
        per_q.setdefault(r["q_id"], []).append(r["rk"])
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)) and len(rks) <= 10


# --- t24 fertility -----------------------------------------------------------


def test_t24_fertility_invariants(spark):
    rows = _run(spark, "t24_tokenizer_fertility").collect()
    assert rows, "at least one source"
    for r in rows:
        # every word is >= 1 subword; merges never grow the count
        assert r["n_subwords"] >= r["n_words"] > 0
        assert r["fertility"] == r["n_subwords"] / r["n_words"]
        # subwords partition the word's characters exactly
        assert r["chars_per_subword"] <= 4.0  # fixture words are short
        assert r["n_chars"] >= r["n_subwords"]


def test_t24_char_mass_conserved(spark):
    """Sum over subwords of their lengths == total char mass of the
    encoded words (BPE merges re-segment, never drop characters)."""
    from ae_data_integration_spark.catalog.text_q import _T21_MERGES
    from ae_data_integration_spark.operators.bpe import (
        encode_with_merges,
        word_vocab,
    )
    from ae_data_integration_spark.tables import table

    d = table(spark, SF_SMOKE, "documents")
    enc = encode_with_merges(word_vocab(d), _T21_MERGES)
    bad = enc.filter(
        F.aggregate(
            "subwords", F.lit(0), lambda a, s: a + F.length(s)
        ) != F.length("tok")
    ).count()
    assert bad == 0


# --- dq4 dedup drift ---------------------------------------------------------


def test_dq4_mass_and_count_conservation(spark):
    rows = _run(spark, "dq4_dedup_drift").collect()
    assert abs(sum(r["share_before"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["share_after"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert 0 <= r["n_docs_after"] <= r["n_docs_before"]


def test_dq4_matches_d1_redundancy_total(spark):
    """before − after summed over sources == d1's n_redundant (the
    same keep-first rule, partitioned by source)."""
    rows = _run(spark, "dq4_dedup_drift").collect()
    dropped = sum(r["n_docs_before"] - r["n_docs_after"] for r in rows)
    d1 = _run(spark, "d1_exact_dup").collect()[0]
    assert dropped == d1["n_redundant"]


# --- pipe8 CCNet curation cut ------------------------------------------------


def test_pipe8_conserves_corpus_mass(spark):
    """Cells tile the corpus: doc counts and token shares sum to the
    t23 totals (every doc lands in exactly one (lang, bucket) cell)."""
    cells = _run(spark, "pipe8_ccnet_curation").collect()
    t23 = _run(spark, "t23_lm_perplexity").collect()
    assert sum(r["n_docs"] for r in cells) == len(t23)
    assert sum(r["n_tokens"] for r in cells) == sum(r["n_tok"] for r in t23)
    assert abs(sum(r["token_share"] for r in cells) - 1.0) < 1e-12
    assert {r["bucket"] for r in cells} <= {"head", "middle", "tail"}


def test_pipe8_cell_counts_match_joined_parts(spark):
    """Each cell equals the direct (t3 lang ∪ 'und') × (t23 bucket)
    cross-tabulation — the composition adds nothing beyond its
    oracled parts."""
    cells = {
        (r["lang_pred"], r["bucket"]): r["n_docs"]
        for r in _run(spark, "pipe8_ccnet_curation").collect()
    }
    lang = {
        r["doc_id"]: r["lang_pred"] for r in _run(spark, "t3_lang_id").collect()
    }
    want = {}
    for r in _run(spark, "t23_lm_perplexity").collect():
        key = (lang.get(r["doc_id"], "und"), r["bucket"])
        want[key] = want.get(key, 0) + 1
    assert cells == want


# --- t23q LM artifact lifecycle ----------------------------------------------


def test_t23q_serve_equals_train_and_reuses_artifact(spark):
    """The served frame equals the all-in-one t23 EXACTLY, and a
    second call reuses the content-addressed artifact instead of
    rebuilding (mtime of the _DONE marker is stable)."""
    import os

    from ae_data_integration_spark.operators.lm import ensure_lm
    from ae_data_integration_spark.functions.text import tokens as _tok
    from ae_data_integration_spark.tables import table
    from pyspark.sql import functions as F

    rows = lambda df: [  # noqa: E731
        (r["doc_id"], r["n_tok"], r["avg_nll"], r["bucket"])
        for r in df.orderBy("doc_id").collect()
    ]
    served = rows(_run(spark, "t23q_lm_serve"))
    trained = rows(_run(spark, "t23_lm_perplexity"))
    assert served == trained  # bit-equal, incl. tercile boundaries

    d = table(spark, SF_SMOKE, "documents")
    toks = d.select("doc_id", "lang", _tok("text").alias("t"))
    path = ensure_lm(toks, "t", train_filter=(F.col("lang") == "en"),
                     v=64, salt="t23")
    marker = os.path.join(path, "_DONE")
    m0 = os.stat(marker).st_mtime_ns
    ensure_lm(toks, "t", train_filter=(F.col("lang") == "en"), v=64, salt="t23")
    assert os.stat(marker).st_mtime_ns == m0  # not rebuilt


def test_t23q_smoothing_uses_declared_budget(spark):
    """The fixture train slice has < 64 distinct tokens; the serve
    path must smooth with the DECLARED v+1=65 (meta.json), not the
    realized vocab length — a len(vocab)+1 bug would shift every NLL."""
    import json
    import os

    from ae_data_integration_spark.operators.lm import ensure_lm
    from ae_data_integration_spark.functions.text import tokens as _tok
    from ae_data_integration_spark.tables import table
    from pyspark.sql import functions as F

    d = table(spark, SF_SMOKE, "documents")
    toks = d.select("doc_id", "lang", _tok("text").alias("t"))
    path = ensure_lm(toks, "t", train_filter=(F.col("lang") == "en"),
                     v=64, salt="t23")
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["v"] == 64
    assert spark.read.parquet(f"{path}/vocab").count() < 64


# --- s9 retrieval metrics ----------------------------------------------------


def test_s9_metrics_match_direct_overlap(spark):
    """recall@10 equals the directly-computed s8∩s1b overlap per
    query; all metrics live in [0, 1]; a full-recall query has
    rr == 1 and ndcg == 1."""
    m = {r["q_id"]: r for r in _run(spark, "s9_retrieval_metrics").collect()}
    s8 = _run(spark, "s8_truncated_rerank").collect()
    ex = _run(spark, "s1b_ann_fixed_probes").collect()
    truth, got = {}, {}
    for r in ex:
        truth.setdefault(r["q_id"], set()).add(r["n_id"])
    for r in s8:
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    for q, row in m.items():
        overlap = len(got.get(q, set()) & truth[q])
        assert row["n_hit"] == overlap
        assert row["recall_at_10"] == overlap / 10.0
        assert 0.0 <= row["rr"] <= 1.0 and 0.0 <= row["ndcg_at_10"] <= 1.0001
        if row["recall_at_10"] == 1.0 and got[q] == truth[q]:
            # identical ranked sets in identical order -> perfect nDCG
            s8_order = [r["n_id"] for r in s8 if r["q_id"] == q]
            ex_order = [r["n_id"] for r in ex if r["q_id"] == q]
            if s8_order == ex_order:
                assert row["rr"] == 1.0 and abs(row["ndcg_at_10"] - 1.0) < 1e-5


# --- g6 label propagation ----------------------------------------------------


def test_g6_python_golden_and_node_set(spark):
    """g6 equals a pure-Python synchronous-LPA replay of the same
    verified pair graph, and covers exactly the d6 node set."""
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_candidate_pairs_from_shingles,
    )
    from ae_data_integration_spark.tables import table

    d = table(spark, SF_SMOKE, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in jaccard_verify(pairs, shs, threshold=0.5)
        .select("doc_a", "doc_b")
        .collect()
    ]
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {v: v for v in nbrs}
    for _ in range(3):
        new = {}
        for v, ns in nbrs.items():
            cnt = {}
            for u in ns:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(
                cnt, key=lambda L: (-cnt[L], L)
            )  # (count DESC, label ASC)
        lab = new
    sizes = {}
    for L in lab.values():
        sizes[L] = sizes.get(L, 0) + 1
    want = {(v, lab[v], sizes[lab[v]]) for v in lab}
    got = {
        (r["doc_id"], r["label"], r["community_size"])
        for r in _run(spark, "g6_label_propagation").collect()
    }
    assert got == want and len(got) > 0


def test_g6_bridge_edge_does_not_fuse_dense_groups(spark):
    """Two triangles joined by ONE bridge edge: connected components
    merge them; 3-iteration majority LPA keeps two communities — the
    over-merge resistance g6 exists for."""
    from ae_data_integration_spark.operators.dedup import dup_clusters
    from ae_data_integration_spark.operators.graph import label_propagation_fixed

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "doc_a long, doc_b long",
    )
    lpa = {r["doc_id"]: r["label"]
           for r in label_propagation_fixed(pairs, n_iters=3).collect()}
    assert len(set(lpa.values())) == 2
    assert lpa[1] == lpa[2] == lpa[3] and lpa[4] == lpa[5] == lpa[6]
    cc = dup_clusters(pairs, n_iters=4)
    assert cc.count() == 1  # CC fuses them into ONE component row


# --- e12 bucketed interval-overlap join --------------------------------------


def test_e12_matches_naive_python_overlap_join(spark):
    """The bucketed (explode-to-hours, equi-join, dedup) plan returns
    EXACTLY the rows a naive range-predicate replay produces — bucket
    decomposition is a physical strategy, not a semantics change."""
    from ae_data_integration_spark.tables import table
    from pyspark.sql import functions as F

    HOUR, GAP = 3_600_000_000, 1_800_000_000
    ev = [
        (r["user_id"], r["event_id"], r["event_type"], r["ts_us"])
        for r in table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", "event_type",
                F.unix_micros("ts").alias("ts_us"))
        .collect()
    ]
    # sessions
    by_user = {}
    for u, eid, _t, ts in ev:
        by_user.setdefault(u, []).append((ts, eid))
    sessions = []
    for u, rows in by_user.items():
        rows.sort()
        sid, s0, e0 = 0, None, None
        for ts, _eid in rows:
            if s0 is None or ts - e0 > GAP:
                if s0 is not None:
                    sessions.append((u, sid, s0, e0))
                sid += 1
                s0 = ts
            e0 = ts
        sessions.append((u, sid, s0, e0))
    # incidents
    hr, tot = {}, {}
    for _u, _eid, t, ts in ev:
        hr[(t, ts // HOUR)] = hr.get((t, ts // HOUR), 0) + 1
    for (t, _h), n in hr.items():
        c, s = tot.get(t, (0, 0))
        tot[t] = (c + 1, s + n)
    hot = sorted(
        (t, h) for (t, h), n in hr.items()
        if n * tot[t][0] > 2 * tot[t][1]
    )
    incidents = []
    for t, h in hot:
        if incidents and incidents[-1][0] == t and incidents[-1][2] == h - 1:
            incidents[-1] = (t, incidents[-1][1], h)
        else:
            incidents.append((t, h, h))
    # naive overlap join
    want = set()
    for u, sid, s0, e0 in sessions:
        for t, h0, h1 in incidents:
            lo, hi = h0 * HOUR, (h1 + 1) * HOUR
            if s0 < hi and lo <= e0:
                want.add((u, sid, t, h0,
                          min(e0 + 1, hi) - max(s0, lo)))
    got = {
        (r["user_id"], r["sess_id"], r["event_type"], r["incident_id"],
         r["overlap_us"])
        for r in _run(spark, "e12_session_incident_overlap").collect()
    }
    assert got == want and len(got) > 0


# --- dq5 temporal drift ------------------------------------------------------


def test_dq5_counts_partition_the_stream(spark):
    """First + second half counts sum to the table total; shares sum
    to 1 on both sides; a type with equal halves has ~zero drift."""
    from ae_data_integration_spark.tables import table

    rows = _run(spark, "dq5_temporal_drift").collect()
    n = table(spark, SF_SMOKE, "events").count()
    assert sum(r["n_first"] + r["n_second"] for r in rows) == n
    assert abs(sum(r["share_first"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["share_second"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        # log-odds sign tracks the share movement (smoothed, so only
        # assert on clear movers)
        if r["share_second"] > r["share_first"] * 1.05:
            assert r["drift_log_odds"] > 0
        if r["share_second"] * 1.05 < r["share_first"]:
            assert r["drift_log_odds"] < 0


# --- s6i incremental index append ---------------------------------------------
# Lifecycle tests run against a PRIVATE index directory (monkeypatched
# SPARK_GRAFT_INDEX_DIR): the catalog row's shared artifact persists
# across pytest sessions, so its layout (pre- or post-compaction) is
# not a test fixture — the catalog-level guarantees are pinned by the
# parity oracle and the repartition roster instead.


def _s6i_private_index(spark, tmp_path, monkeypatch):
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
    append_to_pq_index(batch, path, tag="mod5batch")
    return e, base, batch, path


def _serve(spark, e, path):
    from ae_data_integration_spark.catalog import similarity_q as sq
    from ae_data_integration_spark.operators.ann_index import pq_serve_topk

    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return [
        (r["q_id"], r["n_id"], r["cos"], r["rk"])
        for r in pq_serve_topk(
            e, q, path, m=sq._S6_M, k=sq._S6_K,
            refine=sq._S6_REFINE, topk=sq._S6_TOPK,
        ).orderBy("q_id", "rk").collect()
    ]


def test_s6i_append_is_idempotent_and_covers_corpus(spark, tmp_path, monkeypatch):
    """Re-running the append (a retried ingest job) must not duplicate
    codes: one row per corpus vector across the code-dir union, an
    identical served frame, and an untouched base build."""
    import os

    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        append_to_pq_index,
    )

    e, base, batch, path = _s6i_private_index(spark, tmp_path, monkeypatch)
    first = _serve(spark, e, path)
    marker = os.path.join(path, "_DONE")
    m0 = os.stat(marker).st_mtime_ns
    append_to_pq_index(batch, path, tag="mod5batch")  # the retry
    assert _serve(spark, e, path) == first
    assert os.stat(marker).st_mtime_ns == m0  # base never rebuilt
    dirs = _code_dirs(path)
    assert len(dirs) == 2  # codes + codes_mod5batch, no duplicates
    union = spark.read.parquet(*dirs)
    assert union.count() == e.count()
    assert union.select("id").distinct().count() == e.count()


def test_s6i_batch_encoded_under_frozen_codebooks(spark, tmp_path, monkeypatch):
    """The increment's codes must equal encoding the batch directly
    with the stored codebook — proof no retraining happened in the
    append path."""
    import os

    from ae_data_integration_spark.catalog import similarity_q as sq
    from ae_data_integration_spark.functions.arrays import to_double
    from ae_data_integration_spark.operators.similarity import _pq_encode

    e, base, batch, path = _s6i_private_index(spark, tmp_path, monkeypatch)
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    b = batch.select(F.col("vec_id").alias("id"), to_double("embedding").alias("v"))
    want = {
        (r["id"], tuple(r["codes"]))
        for r in _pq_encode(b, cb1, sq._S6_M, sq._S6_DS).collect()
    }
    got = {
        (r["id"], tuple(r["codes"]))
        for r in spark.read.parquet(
            os.path.join(path, "codes_mod5batch")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_s6i_compaction_is_semantics_free_and_reappend_noop(
    spark, tmp_path, monkeypatch
):
    """compact_pq_index merges increments into the base codes table:
    the served frame is identical before/after, one codes dir remains,
    a second compaction is a no-op, and re-appending a FOLDED tag is a
    recorded no-op (no resurrected increment, no duplicate ids)."""
    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        append_to_pq_index,
        compact_pq_index,
    )

    e, base, batch, path = _s6i_private_index(spark, tmp_path, monkeypatch)
    before = _serve(spark, e, path)
    assert compact_pq_index(spark, path) == 1
    assert len(_code_dirs(path)) == 1
    assert compact_pq_index(spark, path) == 0  # idempotent no-op
    assert _serve(spark, e, path) == before
    append_to_pq_index(batch, path, tag="mod5batch")  # folded tag: no-op
    assert len(_code_dirs(path)) == 1  # not resurrected
    assert _serve(spark, e, path) == before
    union = spark.read.parquet(*_code_dirs(path))
    assert union.select("id").distinct().count() == union.count() == e.count()


def test_s7i_batch_assigned_and_encoded_under_frozen_artifacts(
    spark, tmp_path, monkeypatch
):
    """IVF-PQ append: the increment's (cell, codes) must equal
    assigning + encoding the batch directly with the stored cents and
    codebook — no retraining of either quantizer; codes union covers
    the corpus exactly once and the retry is idempotent."""
    import os

    from ae_data_integration_spark.catalog import similarity_q as sq
    from ae_data_integration_spark.functions.arrays import to_double
    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        append_to_ivfpq_index,
        build_ivfpq_index,
        index_dir,
    )
    from ae_data_integration_spark.operators.kmeans import _assign
    from ae_data_integration_spark.operators.similarity import _pq_encode
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    e = table(spark, SF_SMOKE, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "ivfpq", "k_coarse": sq._S7_KC, "m": sq._S7_M,
              "k": sq._S7_K, "salt": "ivfpqi", "train": "mod5"}
    path = index_dir(base, "ivfpq", params)
    build_ivfpq_index(base, path, k_coarse=sq._S7_KC, m=sq._S7_M,
                      k=sq._S7_K, salt="ivfpqi")
    append_to_ivfpq_index(batch, path, tag="mod5batch")
    append_to_ivfpq_index(batch, path, tag="mod5batch")  # retry
    union = spark.read.parquet(*_code_dirs(path))
    assert union.count() == e.count()
    assert union.select("id").distinct().count() == e.count()

    cents = spark.read.parquet(os.path.join(path, "cents"))
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    pts = batch.select(F.col("vec_id").alias("id"),
                       to_double("embedding").alias("vec"))
    assigned = _assign(pts, cents.withColumnRenamed("cell", "cluster"))
    res = (
        assigned.select("id", "vec", F.col("cluster").alias("cell"))
        .join(F.broadcast(cents), "cell")
        .select("id", "cell",
                F.zip_with("vec", "centroid", lambda a, b: a - b).alias("v"))
    )
    want = {
        (r["id"], r2["cell"], tuple(r["codes"]))
        for r, r2 in zip(
            sorted(_pq_encode(res.select("id", "v"), cb1, sq._S7_M,
                              sq._S7_DS).collect(), key=lambda r: r["id"]),
            sorted(res.select("id", "cell").collect(), key=lambda r: r["id"]),
        )
    }
    got = {
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(
            os.path.join(path, "codes_mod5batch")
        ).collect()
    }
    assert got == want and len(got) > 0


# --- dq6 dedup audit trail ---------------------------------------------------


def test_dq6_consistent_with_dq4_and_pipe2(spark):
    """The audit trail's exact rows equal dq4's drop total; keepers
    are never themselves dropped; signals partition the rows; every
    near row points into its own CC cluster root."""
    rows = _run(spark, "dq6_dedup_audit").collect()
    dropped = {r["doc_id"] for r in rows}
    kept = {r["kept_id"] for r in rows}
    assert dropped.isdisjoint(kept)  # a keeper is never dropped
    for r in rows:
        assert r["kept_id"] < r["doc_id"]  # keep-first / min-label
        assert r["signal"] in ("exact", "near")
    n_exact = sum(1 for r in rows if r["signal"] == "exact")
    dq4 = _run(spark, "dq4_dedup_drift").collect()
    assert n_exact == sum(
        r["n_docs_before"] - r["n_docs_after"] for r in dq4
    )
