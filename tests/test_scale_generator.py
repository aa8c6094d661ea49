"""Property tests for the scale data generator (VERDICT r6 #7).

SCALE.md claims the 10x/100x replication is SIMILARITY-STRUCTURE
PRESERVING — without that, every scale-leg growth ratio measures a
data artifact instead of the engine (the round-6 leg caught exactly
this: a suffix-token variant inflated LSH dedup 19.9x). The claims,
now asserted instead of prose:

1. intra-replica: the substitution cipher is a bijection on [a-z], so
   word-shingle sets map bijectively and every pairwise Jaccard
   inside a replica EXACTLY equals the original corpus's;
2. cross-replica: a document and its ciphered copy share (almost) no
   shingles — no quadratic cross-replica near-dup mass. Digits and
   punctuation pass through the cipher, so the bound is small, not 0;
3. embeddings intra-replica: the md5 sign-flip pattern cancels in
   every pairwise dot product ((-a)(-b) = ab exactly in IEEE), so
   cosines inside a replica are BIT-IDENTICAL to the original's;
4. embeddings cross-replica: flipped copies decorrelate (|cos| small)
   — no all-pairs near-dup blowup across replicas;
5. distinct replicas get distinct ciphers at factor > 26 (the caesar
   rotation this replaced silently repeated every 26 replicas,
   creating byte-identical cross-replica duplicates).
"""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pytest

from scripts.make_scale_data import generate

SRC = "/root/testdata/sf0.001"
FACTOR = 4


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scalegen") / "sf_scaled")
    generate(src=SRC, out=out, factor=FACTOR)
    return out


def _docs(path: str) -> dict[int, str]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{path}/documents.parquet')"
    ).fetchall()
    con.close()
    return dict(rows)


def _shingles(text: str, n: int = 3) -> set[tuple[str, ...]]:
    toks = text.split()
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_intra_replica_jaccard_exactly_preserved(scaled_dir):
    orig = _docs(SRC)
    scaled = _docs(scaled_dir)
    d_span = max(orig) + 1
    ids = sorted(orig)[:20]
    for rep in range(1, FACTOR):
        for a, b in itertools.combinations(ids, 2):
            sa0, sb0 = _shingles(orig[a]), _shingles(orig[b])
            sar = _shingles(scaled[a + rep * d_span])
            sbr = _shingles(scaled[b + rep * d_span])
            # bijection: sizes and intersection sizes match exactly
            assert len(sar) == len(sa0) and len(sbr) == len(sb0)
            assert len(sar & sbr) == len(sa0 & sb0), (rep, a, b)


def test_cross_replica_shingle_overlap_is_negligible(scaled_dir):
    orig = _docs(SRC)
    scaled = _docs(scaled_dir)
    d_span = max(orig) + 1
    ids = sorted(orig)[:50]
    for rep in range(1, FACTOR):
        jacc = []
        for a in ids:
            s0 = _shingles(orig[a])
            sr = _shingles(scaled[a + rep * d_span])
            union = len(s0 | sr)
            if union:
                jacc.append(len(s0 & sr) / union)
        # same doc, different cipher: only digit/punct-heavy shingles
        # can survive — far below any LSH near-dup threshold (0.7)
        assert max(jacc) < 0.2, (rep, max(jacc))
        assert float(np.mean(jacc)) < 0.05, (rep, float(np.mean(jacc)))


def _vecs(path: str) -> dict[int, np.ndarray]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{path}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {i: np.array(v, dtype=np.float32) for i, v in rows}


def test_intra_replica_cosines_bit_identical(scaled_dir):
    orig = _vecs(SRC)
    scaled = _vecs(scaled_dir)
    v_span = max(orig) + 1
    ids = sorted(orig)[:30]
    for rep in range(1, FACTOR):
        for a, b in itertools.combinations(ids[:12], 2):
            va0 = orig[a].astype(np.float64)
            vb0 = orig[b].astype(np.float64)
            var = scaled[a + rep * v_span].astype(np.float64)
            vbr = scaled[b + rep * v_span].astype(np.float64)
            # sign pattern cancels pairwise: products identical, so the
            # dot is IEEE-exact equal, not approximately equal
            assert float(var @ vbr) == float(va0 @ vb0), (rep, a, b)
            assert float(var @ var) == float(va0 @ va0)


def test_cross_replica_cosines_decorrelate(scaled_dir):
    orig = _vecs(SRC)
    scaled = _vecs(scaled_dir)
    v_span = max(orig) + 1
    ids = sorted(orig)[:50]
    for rep in range(1, FACTOR):
        cos = []
        for a in ids:
            v0 = orig[a].astype(np.float64)
            vr = scaled[a + rep * v_span].astype(np.float64)
            cos.append(abs(v0 @ vr) / max(v0 @ v0, 1e-12))
        # a random +-1 pattern over 64 dims has E|cos| ~ 1/sqrt(64)
        # = 0.125; allow generous slack but exclude near-duplicates
        assert float(np.mean(cos)) < 0.3, (rep, float(np.mean(cos)))
        assert max(cos) < 0.9, (rep, max(cos))


def test_ciphers_distinct_beyond_26_replicas():
    from scripts.make_scale_data import _ALPHA, cipher

    perms = [cipher(i) for i in range(1, 100)]
    assert len(set(perms)) == len(perms)  # caesar repeated every 26
    assert all(p != _ALPHA for p in perms)  # never the identity
    assert all(sorted(p) == sorted(_ALPHA) for p in perms)  # bijections
