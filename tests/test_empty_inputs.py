"""Empty-input robustness: operators must return empty results with
the right schema, not crash, when a filter upstream leaves nothing
(a daily occurrence in scheduled pipelines)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty(spark, schema: str):
    return spark.createDataFrame([], schema)


def test_dbscan_stack_on_empty(spark):
    from ae_data_integration_spark.operators.dbscan import candidate_pairs, dbscan

    pts = _empty(spark, "id long, vec array<double>")
    assert candidate_pairs(pts, 1.0).count() == 0
    out = dbscan(
        _empty(spark, "vec_id long, embedding array<double>"), "vec_id", "embedding"
    )
    assert out.count() == 0
    assert set(out.columns) == {"id", "cluster"}


def test_graph_ops_on_empty(spark):
    from ae_data_integration_spark.operators.dedup import dup_clusters, dup_labels
    from ae_data_integration_spark.operators.graph import pagerank_fixed

    pairs = _empty(spark, "doc_a long, doc_b long")
    assert dup_labels(pairs).count() == 0
    assert dup_clusters(pairs).count() == 0
    assert pagerank_fixed(pairs).count() == 0


def test_chunking_on_empty(spark):
    from ae_data_integration_spark.operators.chunking import chunk_tokens, pack_chunks

    docs = _empty(spark, "doc_id long, text string")
    ch = chunk_tokens(docs)
    assert ch.count() == 0
    assert pack_chunks(ch).count() == 0


def test_chunking_rejects_degenerate_stride(spark):
    import pytest

    from ae_data_integration_spark.operators.chunking import chunk_tokens

    docs = _empty(spark, "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(docs, chunk=32, overlap=32)
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(docs, chunk=32, overlap=40)
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(docs, chunk=32, overlap=-1)
    with pytest.raises(ValueError, match="chunk"):
        chunk_tokens(docs, chunk=0, overlap=0)


def test_cms_on_empty(spark):
    from ae_data_integration_spark.functions.sketch import cms_build, cms_estimate

    ev = _empty(spark, "user_id long")
    sk = cms_build(ev, "user_id")
    assert sk.count() == 0
    probes = spark.createDataFrame([(1,)], "user_id long")
    # empty sketch: every probe cell is absent -> the correct CMS
    # point-query answer is 0 (a key the sketch never saw), not a
    # silently dropped row
    rows = cms_estimate(sk, probes, "user_id").collect()
    assert len(rows) == 1 and rows[0]["cms_n"] == 0


def test_cms_probe_outside_build_set(spark):
    from ae_data_integration_spark.functions.sketch import cms_build, cms_estimate

    ev = spark.createDataFrame([(1,), (1,), (2,)], "user_id long")
    sk = cms_build(ev, "user_id")
    # a probe key never seen at build time: CMS answers with its
    # one-sided overestimate (>= 0), never drops the probe
    probes = spark.createDataFrame([(1,), (999,)], "user_id long")
    est = {r["user_id"]: r["cms_n"] for r in cms_estimate(sk, probes, "user_id").collect()}
    assert set(est) == {1, 999}
    assert est[1] >= 2 and est[999] >= 0


def test_asof_join_on_empty_right(spark):
    from ae_data_integration_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 100)], "user_id long, event_id long, ts_us long")
    right = _empty(spark, "user_id long, ts_us long, v double")
    out = asof_join(left, right, "user_id", "ts_us", ["v"]).collect()
    assert len(out) == 1 and out[0]["asof_v"] is None


def test_bpe_on_empty(spark):
    from ae_data_integration_spark.operators.bpe import (
        encode_with_merges,
        train_bpe,
        word_vocab,
    )

    docs = _empty(spark, "doc_id long, text string")
    m = train_bpe(spark, docs, rounds=3)
    assert m.count() == 0
    assert set(m.columns) == {"rank", "left", "right", "merged",
                              "n_occurrences"}
    enc = encode_with_merges(word_vocab(docs), [("a", "b")])
    assert enc.count() == 0


def test_r9_operators_on_empty(spark):
    from ae_data_integration_spark.operators.bpe_batched import train_bpe_batched
    from ae_data_integration_spark.operators.dedup import semantic_dedup_lsh
    from ae_data_integration_spark.operators.similarity import (
        ivfpq_adc_rerank,
        pq_adc_rerank,
    )

    emb = _empty(spark, "vec_id long, embedding array<double>")

    # semantic_dedup_lsh: n=0 -> bits=0, empty assignment, no crash
    assignment, bits, n = semantic_dedup_lsh(emb)
    assert n == 0 and bits == 0
    assert assignment.count() == 0
    assert set(assignment.columns) == {"id", "cluster", "is_dup"}

    # PQ / IVF-PQ on an empty corpus: dim is unknowable -> the
    # operators refuse loudly instead of building a 0-dim codebook
    import pytest

    with pytest.raises(ValueError, match="dim"):
        pq_adc_rerank(emb, emb)
    with pytest.raises(ValueError, match="dim"):
        ivfpq_adc_rerank(emb, emb)

    # batched BPE on an empty corpus: empty merge table, right schema
    docs = _empty(spark, "doc_id long, text string")
    out = train_bpe_batched(spark, docs, rounds=5)
    assert out.count() == 0
    assert out.columns == ["rank", "left", "right", "merged", "n_occurrences"]


def test_r10b_operators_on_empty(spark):
    from ae_data_integration_spark.functions.ranks import order_statistics
    from ae_data_integration_spark.operators.similarity import truncated_rerank_topk

    # order_statistics: empty frame + no ranks is a valid no-op; any
    # requested rank on it is out of bounds and fails loudly
    empty = _empty(spark, "v long, k long")
    rows, n = order_statistics(empty, ["v", "k"], [])
    assert rows == [] and n == 0
    import pytest

    with pytest.raises(IndexError):
        order_statistics(empty, ["v", "k"], [1])
    rows, n = order_statistics(empty, ["v", "k"], lambda n: [])
    assert rows == [] and n == 0

    # truncated_rerank_topk: empty corpus/queries -> empty result with
    # the contract schema (dim probe returns None, HOF fold path)
    emb = _empty(spark, "vec_id long, embedding array<double>")
    out = truncated_rerank_topk(emb, emb)
    assert out.count() == 0
    assert out.columns == ["q_id", "n_id", "cos", "rk"]


def test_lm_stack_on_empty_and_oov_only(spark):
    from ae_data_integration_spark.operators.lm import (
        bigram_pairs,
        score_pairs,
        top_vocab,
        train_bigram_counts,
    )

    # empty reference slice: vocab is empty, every scored token is
    # OOV — the mapper must not call isin() with zero arguments
    empty = _empty(spark, "doc_id long, t array<string>")
    assert top_vocab(empty, "t", 64) == []
    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "doc_id long, t array<string>"
    )
    pairs = bigram_pairs(docs, [], "t", keep=("doc_id",))
    rows = {(r["doc_id"], r["prev"], r["cur"]) for r in pairs.collect()}
    assert rows == {(1, "<s>", "<unk>"), (1, "<unk>", "<unk>"),
                    (2, "<s>", "<unk>")}
    bg, ctx = train_bigram_counts(bigram_pairs(empty, [], "t"))
    scored = score_pairs(pairs, bg, ctx, emit=65)
    got = {r["doc_id"]: r["n_tok"] for r in scored.collect()}
    assert got == {1: 2, 2: 1}  # all-miss smoothing path, no crash


def test_t23_bucketize_on_empty(spark):
    from ae_data_integration_spark.catalog.text_q import _t23_bucketize

    empty = _empty(spark, "doc_id long, n_tok long, avg_nll double")
    out = _t23_bucketize(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tok", "avg_nll", "bucket"]
