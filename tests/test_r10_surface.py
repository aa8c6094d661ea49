"""Round-10 surface: the ANN index build/serve split (s6q/s7q must
return EXACTLY what the all-in-one train-and-serve operators return,
from a persisted artifact that is reused — not rebuilt — across
queries), the IVF-PQ negated-L2 ADC recall floor, and the
content-addressed index cache discipline.

Oracles pin the values (parity harness); these tests pin the
artifact lifecycle, which no SQL oracle can see.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import REGISTRY, load_all, resolve
from ae_data_integration_spark.operators.ann_index import (
    ensure_ivfpq_index,
    ensure_pq_index,
    index_dir,
    ivfpq_serve_topk,
    pq_serve_topk,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE

load_all()


def _rows(df):
    return [
        (r.q_id, r.n_id, r.cos, r.rk)
        for r in df.orderBy("q_id", "rk").collect()
    ]


@pytest.fixture(scope="module")
def emb_q(spark):
    e = table(spark, SF_SMOKE, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return e, q


def test_pq_serve_equals_train_and_serve(spark, emb_q):
    """Serve-from-artifact must be BIT-equal to the all-in-one path:
    training is deterministic and parquet round-trips doubles/longs
    exactly, so any divergence means the artifact lifecycle broke."""
    e, q = emb_q
    allinone = _rows(REGISTRY[resolve("s6_pq_adc_rerank")].fn(spark, SF_SMOKE))
    path = ensure_pq_index(e, m=8, k=32, salt="pq")
    served = _rows(pq_serve_topk(e, q, path, m=8, k=32, refine=60, topk=10))
    assert served == allinone


def test_ivfpq_serve_equals_train_and_serve(spark, emb_q):
    e, q = emb_q
    allinone = _rows(REGISTRY[resolve("s7_ivfpq_adc_rerank")].fn(spark, SF_SMOKE))
    path = ensure_ivfpq_index(e, k_coarse=8, m=8, k=32, salt="ivfpq")
    served = _rows(
        ivfpq_serve_topk(e, q, path, m=8, k=32, nprobe=4, refine=120, topk=10)
    )
    assert served == allinone


def test_index_is_reused_not_rebuilt(spark, emb_q):
    """Second ensure_* with the same params + dataset must serve the
    cached artifact — the whole point of the build/serve split."""
    e, q = emb_q
    path = ensure_pq_index(e, m=8, k=32, salt="pq")
    done = os.path.join(path, "_DONE")
    mtime = os.stat(done).st_mtime_ns
    path2 = ensure_pq_index(e, m=8, k=32, salt="pq")
    assert path2 == path
    assert os.stat(done).st_mtime_ns == mtime


def test_index_cache_is_content_addressed(spark, emb_q):
    """Different params -> different artifact directory; the dataset
    fingerprint keys on file (path, size, mtime) so a regenerated
    corpus can never be served a stale index."""
    e, _ = emb_q
    p1 = index_dir(e, "pq", {"kind": "pq", "m": 8, "k": 32, "salt": "pq"})
    p2 = index_dir(e, "pq", {"kind": "pq", "m": 4, "k": 32, "salt": "pq"})
    assert p1 != p2


def test_serve_plan_reads_the_artifact_not_training(spark, emb_q):
    """The serve plan must scan the persisted codes/codebook parquet;
    a training term (the corpus-wide assignment window) would show up
    as extra exchanges and a scan count mismatch."""
    e, q = emb_q
    path = ensure_pq_index(e, m=8, k=32, salt="pq")
    plan = pq_serve_topk(
        e, q, path, m=8, k=32, refine=60, topk=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "codes" in plan and "codebook" in plan


def test_ivfpq_recall_floor(spark, emb_q):
    """Negated-L2 ADC + nprobe=4 + refine=120: measured recall@10 is
    0.70 at sf0.001 (= the exact-cosine ceiling of the probed cells).
    Floor at 0.65 to allow fixture drift, not regression."""
    e, q = emb_q
    truth = {
        (r.q_id, r.n_id)
        for r in REGISTRY[resolve("s1b_ann_fixed_probes")].fn(spark, SF_SMOKE).collect()
    }
    got = {
        (r.q_id, r.n_id)
        for r in REGISTRY[resolve("s7_ivfpq_adc_rerank")].fn(spark, SF_SMOKE).collect()
    }
    assert len(got & truth) / len(truth) >= 0.65


def test_jaccard_verify_prune_branches_identical(spark):
    """The size-adaptive verify prune (r10) is semantics-free: the
    pruned (broadcast candidate-doc filter) and unpruned plans return
    identical (doc_a, doc_b, jaccard) rows; auto mode picks the
    unpruned branch at fixture scale (plan-stats far below the 128 MB
    switch) and its plan carries no broadcast of the doc set."""
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_candidate_pairs_from_shingles,
    )
    from ae_data_integration_spark.tables import table
    from tests.conftest import SF_SMOKE

    d = table(spark, SF_SMOKE, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True)
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)

    rows = lambda df: sorted(  # noqa: E731
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )
    pruned = rows(jaccard_verify(pairs, shs, prune=True))
    unpruned = rows(jaccard_verify(pairs, shs, prune=False))
    auto = rows(jaccard_verify(pairs, shs))
    assert pruned == unpruned == auto and len(auto) > 0
