"""Round-8 surface: semantic dedup, incremental dedup, hashed
classifier, Bloom join pre-filter.

The DuckDB oracles already pin every value end to end (parity
harness); these tests pin the SEMANTIC invariants that make the
results right — survivor policy, no-false-negative sketches, cross-
corpus candidate equivalence — against independent numpy/pure-Python
recomputation, so a same-wrong-both-sides oracle bug can't hide.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import REGISTRY, load_all, resolve
from ae_data_integration_spark.operators.dedup import (
    doc_shingles,
    lsh_candidate_pairs_across,
    lsh_candidate_pairs_from_shingles,
    semantic_dedup,
)
from ae_data_integration_spark.plans.explain import plan_asserts
from ae_data_integration_spark.tables import table
from tests.conftest import SF_CORRECT, SF_SMOKE

load_all()


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[resolve(name)].fn(spark, sf).toPandas()


# --- semantic dedup ---------------------------------------------------------


def test_semantic_dedup_drop_set_matches_numpy(spark):
    """Given the engine's own cluster assignment, the drop set must
    equal the exact numpy within-cluster cosine>=t smaller-id rule."""
    e = table(spark, SF_SMOKE, "embeddings")
    sd = semantic_dedup(e, k=5, n_iter=1, threshold=0.35, salt="sd").toPandas()
    emb = pd.read_parquet(SF_SMOKE + "/embeddings.parquet")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    expected_dup = set()
    for _, grp in sd.groupby("cluster"):
        ids = sorted(grp["id"])
        v = np.stack([vecs[i] for i in ids])
        n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        cos = n @ n.T
        for bi in range(len(ids)):
            if any(cos[ai, bi] >= 0.35 for ai in range(bi)):
                expected_dup.add(ids[bi])
    got_dup = set(sd[sd["is_dup"]]["id"])
    assert got_dup == expected_dup
    assert len(got_dup) > 0, "corpus has near-dups by construction"


def test_semantic_dedup_keeps_cluster_min(spark):
    e = table(spark, SF_SMOKE, "embeddings")
    sd = semantic_dedup(e, k=5, n_iter=1, threshold=0.35, salt="sd").toPandas()
    mins = sd.groupby("cluster")["id"].min()
    kept = sd[~sd["is_dup"]].groupby("cluster")["id"].min()
    assert (mins == kept).all(), "smallest id per cluster can never be dropped"


# --- cross-corpus LSH candidates --------------------------------------------


def test_lsh_across_equals_cross_subset_of_self_join(spark):
    """Candidates across (batch, corpus) must be exactly the self-join
    candidates of the union that straddle the two sides."""
    d = table(spark, SF_SMOKE, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    sh_b = doc_shingles(batch, "doc_id", "text", k=5)
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5)
    sh_all = doc_shingles(d, "doc_id", "text", k=5)
    across = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs_across(sh_b, sh_c).collect()
    }
    self_pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs_from_shingles(sh_all).collect()
    }
    straddling = {
        frozenset(p) for p in self_pairs if (p[0] % 5 == 0) != (p[1] % 5 == 0)
    }
    assert {frozenset(p) for p in across} == straddling
    assert all(a % 5 == 0 and b % 5 != 0 for a, b in across)


def test_incremental_dedup_survivors_are_batch_only(spark):
    out = _run(spark, "pipe5_incremental_dedup")
    assert (out["doc_id"] % 5 == 0).all()
    n_batch = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    n_batch = int((n_batch["doc_id"] % 5 == 0).sum())
    assert 0 < len(out) < n_batch, "some batch docs must be deduped away"


# --- Bloom pre-filter -------------------------------------------------------


def test_bloom_prefilter_no_false_negatives(spark):
    """A Bloom filter may over-approximate, never under-approximate:
    every exact member must survive the pre-filter, so candidates ==
    exact + false positives in every group."""
    out = _run(spark, "sk3_bloom_prefilter")
    assert (out["n_candidates"] >= out["n_exact"]).all()
    assert (out["n_candidates"] - out["n_false_pos"] == out["n_exact"]).all()


def test_bloom_prefilter_fp_rate_near_prediction(spark):
    """Measured false-positive rate should sit near the analytic
    (1 - e^(-kn/m))^k for the build-side cardinality at sf0.01."""
    out = _run(spark, "sk3_bloom_prefilter", SF_CORRECT)
    non_members = (out["n_probed"] - out["n_exact"]).sum()
    fp = out["n_false_pos"].sum()
    n = 959  # distinct urgent high-value custkeys at sf0.01
    predicted = (1 - np.exp(-3 * n / 4096)) ** 3
    measured = fp / non_members
    assert 0.3 * predicted < measured < 3 * predicted


def test_bloom_prefilter_broadcasts_filter(spark):
    pa = plan_asserts(REGISTRY[resolve("sk3_bloom_prefilter")].fn(spark, SF_CORRECT))
    pa.has_broadcast_join(1).no_python_row_udf()


# --- hashed linear classifier -----------------------------------------------


def _py_t16(text: str) -> tuple[str, int]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    counts: dict[int, int] = {}
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % 64
        counts[b] = counts.get(b, 0) + 1
    best = None
    for lang in ("de", "en", "es", "fr", "zh"):
        s = 0
        for b, c in counts.items():
            w = int(hashlib.md5(f"lc{lang}:{b}".encode()).hexdigest()[:12], 16) - (1 << 47)
            s += c * w
        if best is None or s > best[1]:
            best = (lang, s)
    return best


def test_t16_matches_pure_python(spark):
    out = _run(spark, "t16_hashed_classifier").set_index("doc_id")
    docs = pd.read_parquet(SF_SMOKE + "/documents.parquet").head(25)
    for r in docs.itertuples():
        lang, score = _py_t16(r.text)
        assert out.loc[r.doc_id, "pred_class"] == lang
        assert int(out.loc[r.doc_id, "score_q"]) == score


def test_t16_broadcasts_weights(spark):
    pa = plan_asserts(REGISTRY[resolve("t16_hashed_classifier")].fn(spark, SF_CORRECT))
    pa.has_broadcast_join(1).no_python_row_udf()
    assert "CartesianProduct" not in pa.plan


# --- cross-source dup matrix / triangles ------------------------------------


def _verified_pairs(spark, sf=SF_SMOKE):
    from ae_data_integration_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs_from_shingles,
    )

    d = table(spark, sf, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    return jaccard_verify(pairs, shs, threshold=0.5).select("doc_a", "doc_b")


def test_d7_matrix_accounts_for_every_verified_pair(spark):
    out = _run(spark, "d7_cross_source_dup_matrix")
    n_pairs_total = len(_verified_pairs(spark).collect())
    assert out["n_pairs"].sum() == n_pairs_total
    assert (out["src_a"] <= out["src_b"]).all()
    assert (out["n_docs_a"] <= out["n_pairs"]).all()


def test_g5_matches_brute_force_triangles(spark):
    edges = {(r.doc_a, r.doc_b) for r in _verified_pairs(spark).collect()}
    und = edges | {(b, a) for a, b in edges}
    nbrs: dict[int, set] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    tri_per_node: dict[int, int] = {}
    for a, b in edges:
        for c in nbrs[a] & nbrs[b]:
            if c > b:  # a<b<c exactly once
                for v in (a, b, c):
                    tri_per_node[v] = tri_per_node.get(v, 0) + 1
    out = _run(spark, "g5_triangle_count")
    expected = sorted(tri_per_node.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = list(zip(out["doc_id"], out["n_triangles"]))
    assert got == expected and len(got) > 0


# --- BPE pair counts / weighted sampling ------------------------------------


def test_t17_matches_pure_python(spark):
    docs = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    vocab: dict[str, int] = {}
    for text in docs["text"]:
        for t in re.split(r"\s+", text.lower()):
            if t:
                vocab[t] = vocab.get(t, 0) + 1
    pc: dict[str, int] = {}
    for t, n in vocab.items():
        for i in range(len(t) - 1):
            pc[t[i:i + 2]] = pc.get(t[i:i + 2], 0) + n
    expected = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    out = _run(spark, "t17_bpe_pair_counts")
    assert list(zip(out["pair"], out["n_occurrences"])) == expected


def test_samp2_overweights_long_documents(spark):
    """Inclusion probability ∝ n_chars: the weighted sample's mean
    doc length must sit clearly above the corpus mean (the semantic
    the cross-engine oracle alone cannot distinguish from uniform)."""
    out = _run(spark, "samp2_weighted_sample", SF_CORRECT)
    docs = pd.read_parquet(SF_CORRECT + "/documents.parquet")
    assert len(out) == 50
    assert (out["key_q"].diff().dropna() >= 0).all()
    assert out["n_chars"].mean() > 1.1 * docs["n_chars"].mean()
