"""Similarity-search queries over the embeddings table.

Brute-force cosine top-k (correctness baseline) and random-
hyperplane-LSH bucketed near-dup pairs (scale path). Hyperplanes are
md5-derived, so DuckDB regenerates them bit-for-bit (operators/
similarity.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.operators.similarity import brute_force_topk, lsh_near_dup_pairs
from ae_data_integration_spark.tables import table

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sq(a: str) -> str:
    return f"list_reduce(list_transform({a}, x -> x * x), (p, q) -> p + q)"


def _dotp(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
        f" (x, y) -> x + y)"
    )


# --- S1: brute-force cosine top-10 ------------------------------------------

_S1_SQL = f"""
WITH e AS (SELECT vec_id, {_V} AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id AS n_id,
         {_dotp('q.qv', 'e.v')} / greatest(sqrt({_sq('q.qv')}) * sqrt({_sq('e.v')}), 1e-12) AS cos
  FROM q JOIN e ON e.vec_id != q.q_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM scored
) WHERE rk <= 10
ORDER BY q_id, rk
"""


@register("s1_ann_bruteforce", oracle=_S1_SQL,
          doc="Exact cosine top-10 for probe queries; broadcast Q × scan N, no shuffle.",
          tags=("similarity", "bench"))
def s1_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(e, q, k=10).orderBy("q_id", "rk")


# --- S1b: brute force with a FIXED probe budget ------------------------------
# s1's probe set (vec_id % 100 == 0) grows ∝ N, so its scale-leg
# growth column measures an O(N·Q)=O(N²/100) workload — 9.24× at 10×
# data said nothing about the engine (VERDICT r7). This twin pins
# Q = 20 probes (the sf0.1 probe count) at every scale factor, so its
# growth ratio isolates the engine's scan+broadcast scaling; s1 stays
# registered as the Q∝N stress but is excluded from bench scale legs.

_S1B_SQL = _S1_SQL.replace(
    "WHERE vec_id % 100 = 0", "WHERE vec_id % 100 = 0 AND vec_id < 2000"
)


@register("s1b_ann_fixed_probes", oracle=_S1B_SQL,
          doc="s1 with a FIXED 20-probe budget (vec_id % 100 == 0 and "
              "vec_id < 2000): broadcast Q × scan N with Q held constant "
              "across scale factors, so the bench growth column measures "
              "the corpus scan, not the probe-count arithmetic.",
          tags=("similarity", "bench"))
def s1b_ann_fixed_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return brute_force_topk(e, q, k=10).orderBy("q_id", "rk")


# --- S2: hyperplane-LSH bucketed near-dup pairs -----------------------------

_MD5U = (
    "CAST(('0x' || substr(md5('hp' || {key}), 1, 12)) AS BIGINT)"
    " / 281474976710656.0"
)


def _proj(j: str) -> str:
    # len(v), not a hardcoded width: the Spark side probes the real
    # dimension at runtime (similarity._vec_dim), so a fixture-width
    # change must move both sides together (same fix as pipe4b, r10).
    unit = _MD5U.format(key=f"{j} || ':' || p[2]")
    return (
        f"list_reduce(list_transform(list_zip(v, range(0, len(v))),"
        f" p -> p[1] * ({unit} - 0.5)), (a, b) -> a + b)"
    )


_S2_SQL = f"""
WITH e AS (SELECT vec_id AS id, {_V} AS v FROM embeddings),
sig AS (
  SELECT id, v,
         list_reduce(
           list_transform(range(0, 8),
             j -> CASE WHEN {_proj('j')} > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END),
           (a, b) -> a + b) AS bucket
  FROM e
)
SELECT a.id AS id_a, b.id AS id_b,
       {_dotp('a.v', 'b.v')} / greatest(sqrt({_sq('a.v')}) * sqrt({_sq('b.v')}), 1e-12) AS cos
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.id < b.id
ORDER BY id_a, id_b
"""


@register("s2_lsh_near_dup", oracle=_S2_SQL,
          doc="Random-hyperplane LSH (8 bits, md5-derived planes): bucketed "
              "candidate pairs with exact cosine — the N² crossJoin killer.",
          tags=("similarity",))
def s2_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return (
        lsh_near_dup_pairs(e, bits=8, threshold=-1.0)
        .orderBy("id_a", "id_b")
    )


# --- S3: IVF ANN (coarse quantizer + probed cells) --------------------------

from ae_data_integration_spark.catalog.kmeans_q import _assign_cte, _update_cte
from ae_data_integration_spark.operators.similarity import ivf_topk


def _ivf_sql(k_clusters: int = 8, nprobe: int = 2, topk: int = 3) -> str:
    return f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS vec FROM embeddings),
init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('ivf' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts ORDER BY md5('ivf' || CAST(id AS VARCHAR)), id LIMIT {k_clusters})
),
{_assign_cte('pts', 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
q AS (SELECT id AS q_id, vec AS q_vec FROM pts WHERE id % 100 = 0),
qd AS (
  SELECT q.q_id, q.q_vec, c.cluster,
         list_reduce(list_transform(list_zip(q.q_vec, c.centroid),
                                    p -> (p[1]-p[2]) * (p[1]-p[2])), (x,y) -> x+y) AS cdist
  FROM q CROSS JOIN c1 c
),
probes AS (
  SELECT q_id, q_vec, cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cdist, cluster) AS rk FROM qd
  ) WHERE rk <= {nprobe}
),
cand AS (
  SELECT p.q_id, a.id AS n_id,
         {_dotp('p.q_vec', 'a.vec')}
           / greatest(sqrt({_sq('p.q_vec')}) * sqrt({_sq('a.vec')}), 1e-12) AS cos
  FROM probes p JOIN a2 a ON p.cluster = a.cluster AND a.id != p.q_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk FROM cand
) WHERE rk <= {topk}
ORDER BY q_id, rk
"""


@register("s3_ivf_topk", oracle=_ivf_sql(),
          doc="IVF ANN: md5-seeded coarse KMeans quantizer, nprobe=2 probed "
              "cells, exact cosine within cells — the large-Q scale path; "
              "oracle replays quantizer+probe+rank end to end.",
          tags=("similarity", "bench"))
def s3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(e, q, k_clusters=8, n_iter=1, nprobe=2, topk=3, salt="ivf").orderBy(
        "q_id", "rk"
    )


# --- S4: hybrid lexical + vector retrieval (reciprocal-rank fusion) ---------
# The retrieval stack a RAG / data-curation pipeline actually runs:
# a BM25 lexical leg (catalog/text_q.bm25_scored — the t14 scorer,
# shared CTE text so both oracles replay the identical BM25) and an
# exact-cosine vector leg (the s1 machinery, probe = embedding 0,
# joined to documents 1:1 by vec_id == doc_id), each ranked top-50
# with deterministic tie-breaks, fused by reciprocal-rank fusion
# score = sum 1/(60 + rank) over the legs a doc appears in. RRF works
# on RANKS, so the fused score is a sum of two exactly-representable
# divisions — bit-portable with no quantization needed.
# Scale shape: each leg ends in a TakeOrdered top-50 (no global sort
# materializes more than the head), the rank windows run over <= 50
# rows, and the fusion joins two 50-row frames — the whole fusion
# stage is driver-trivial regardless of corpus size.

_S4_TOPN, _S4_K, _S4_FINAL = 50, 60, 10


def _s4_sql() -> str:
    from ae_data_integration_spark.catalog.text_q import BM25_SCORED_CTES

    return f"""{BM25_SCORED_CTES},
lexr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT {_S4_TOPN})
),
e AS (SELECT vec_id, {_V} AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
vs AS (
  SELECT e.vec_id AS doc_id,
         {_dotp('q.qv', 'e.v')} / greatest(sqrt({_sq('q.qv')}) * sqrt({_sq('e.v')}), 1e-12) AS cos
  FROM e, q WHERE e.vec_id != 0
),
vecr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r
  FROM (SELECT * FROM vs ORDER BY cos DESC, doc_id LIMIT {_S4_TOPN})
)
SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       (COALESCE(1.0 / ({_S4_K} + l.r), 0.0)
        + COALESCE(1.0 / ({_S4_K} + v.r), 0.0)) AS rrf
FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
ORDER BY rrf DESC, doc_id LIMIT {_S4_FINAL}
"""


@register("s4_hybrid_rrf", oracle=_s4_sql(),
          doc="Hybrid retrieval: BM25 lexical top-50 (shared t14 scorer) + "
              "exact-cosine vector top-50 (probe = embedding 0, docs joined "
              "1:1 by id), reciprocal-rank fusion 1/(60+rank), final top-10. "
              "Each leg is a TakeOrdered head; fusion joins two 50-row "
              "frames — corpus-size-independent tail.",
          tags=("similarity", "retrieval"))
def s4_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ae_data_integration_spark.catalog.text_q import bm25_scored

    lex = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(_S4_TOPN)
    )
    # rank windows run AFTER the top-50 head: <= 50 rows, the
    # no-partition window is deliberate and bounded.
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("lr"),
    )
    e = table(spark, sf_dir, "embeddings")
    vec = brute_force_topk(e, e.filter(F.col("vec_id") == 0), k=_S4_TOPN)
    vecr = vec.select(F.col("n_id").alias("doc_id"), F.col("rk").alias("vr"))
    rrf = (
        F.coalesce(F.lit(1.0) / (F.lit(_S4_K) + F.col("lr")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(_S4_K) + F.col("vr")), F.lit(0.0))
    )
    return (
        lexr.join(vecr, "doc_id", "full_outer")
        .select("doc_id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(_S4_FINAL)
    )


# --- S5: SQ8 scalar-quantized scan + exact rerank ----------------------------
# The memory-bandwidth ANN path (faiss IndexScalarQuantizer shape):
# per-dim (min, max) grid -> 8-bit codes -> approximate top-`refine`
# over the quantized corpus -> exact-cosine rerank of Q x refine
# rows. The approx score is an integer Q30 fixed-point dot, so ranks
# are order-independent and the oracle replays the pipeline
# bit-for-bit. At 100 TB the scanned column is the 1-byte code array
# (4-8x fewer bytes/vector); full-precision rows are read only for
# the rerank join.

_S5_REFINE, _S5_TOPK = 30, 10
_Q30 = 1 << 30

_S5_SQL = f"""
WITH e AS (SELECT vec_id AS id, {_V} AS v FROM embeddings),
lng AS (SELECT generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM e),
st AS (
  SELECT dim, min(x) AS mn, greatest((max(x) - min(x)) / 255.0, 1e-12) AS stp
  FROM lng GROUP BY dim
),
grid AS (SELECT list(mn ORDER BY dim) AS mins, list(stp ORDER BY dim) AS steps FROM st),
dq AS (
  SELECT id,
         list_transform(list_zip(v, range(1, 65)),
           p -> mins[p[2]] +
                least(255.0, greatest(0.0, round((p[1] - mins[p[2]]) / steps[p[2]])))
                * steps[p[2]]) AS dqv
  FROM e, grid
),
probes AS (SELECT id AS q_id, dqv AS q_dq FROM dq WHERE id % 100 = 0 AND id < 2000),
appr AS (
  SELECT p.q_id, d.id AS n_id,
         list_reduce(list_transform(list_zip(p.q_dq, d.dqv),
           p2 -> CAST(round(p2[1] * p2[2] * {_Q30}) AS BIGINT)), (a, b) -> a + b) AS s
  FROM probes p JOIN dq d ON d.id != p.q_id
),
cand AS (
  SELECT q_id, n_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rk FROM appr
  ) WHERE rk <= {_S5_REFINE}
),
rer AS (
  SELECT c.q_id, c.n_id,
         {_dotp('eq.v', 'en.v')}
           / greatest(sqrt({_sq('eq.v')}) * sqrt({_sq('en.v')}), 1e-12) AS cos
  FROM cand c JOIN e eq ON eq.id = c.q_id JOIN e en ON en.id = c.n_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk FROM rer
) WHERE rk <= {_S5_TOPK}
ORDER BY q_id, rk
"""


@register("s5_sq8_rerank", oracle=_S5_SQL,
          doc="SQ8 ANN: per-dim min/max grid -> 8-bit codes -> integer-Q30 "
              "approximate top-30 over the quantized corpus -> exact-cosine "
              "rerank to top-10. One 64-cell stats agg, per-row dequantize "
              "before the broadcast join, zero corpus shuffle; rerank reads "
              "only Q*refine original rows. Probe budget PINNED at 20 "
              "(vec_id % 100 == 0 and < 2000) so the bench scale rows "
              "measure corpus scan growth, not probe-count arithmetic "
              "(same discipline as s1b).",
          tags=("similarity", "bench"))
def s5_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.similarity import sq8_rerank_topk

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return sq8_rerank_topk(
        e, q, topk=_S5_TOPK, refine=_S5_REFINE
    ).orderBy("q_id", "rk")


# --- S6: product-quantization ANN with ADC + exact rerank --------------------
# The missing step between SQ8 (one global grid, 1 byte/dim) and IVF
# (cell pruning): PQ trains m per-subspace codebooks and stores m
# CODES per vector (here 4 codes for 64 dims — a 32x scan reduction
# on float64), and query scoring is m integer table lookups per doc
# (ADC), no float math against the corpus. At 100 TB this is the
# memory-bandwidth shape faiss IndexPQ ships. Fully deterministic:
# md5-seeded grouped-kmeans codebooks (one Lloyd pass, fixed-point
# means — the c1 discipline extended with a subspace key), Q30
# integer LUT entries (order-independent sums), (score, id)
# tie-breaks; the oracle replays training, encoding, ADC and the
# exact-cosine rerank end to end.

# 8 subspaces x 8 dims, 32 centroids each: recall@10 vs brute force
# measured 0.76 at sf0.001 AND sf0.01 on the isotropic synthetic
# embeddings (m=4/k=16 gave 0.18-0.36 — random data has no cluster
# structure, so subspace resolution is what buys ADC ranking quality;
# the sweep is recorded in tests/test_r9_surface.py's docstring).
# Codes stay 8 small ints/vector — the production byte shape.
_S6_M, _S6_K, _S6_DS = 8, 32, 8
_S6_REFINE, _S6_TOPK = 60, 10
_S6_Q30 = 1 << 30


def _pq_ctes(m: int = _S6_M, k: int = _S6_K, ds: int = _S6_DS,
             refine: int = _S6_REFINE, salt: str = "pq",
             train_pred: str = "", index_where: str = "") -> str:
    # The PQ train/encode/ADC/rerank replay as a reusable CTE chain
    # ending in `ranked` (q_id, n_id, cos, rk) — _pq_sql appends the
    # plain top-k tail; pipe9_corpus_lifecycle splices the same chain
    # into its end-to-end composition oracle.
    #
    # train_pred: optional predicate on `id` restricting which vectors
    # TRAIN the codebooks (seeds + the Lloyd pass); encoding always
    # covers every vector. This is how the s6i incremental-append
    # oracle replays "train on the base corpus, encode the appended
    # batch under the FROZEN codebooks" — the same cb1 is trained
    # from the base subset and then assigns ALL ids.
    # index_where: optional predicate on `id` restricting which
    # encoded vectors are SERVED (the codes-table membership) — how
    # pipe9 replays an index holding base ∪ accepted-batch only.
    tw = f"WHERE {train_pred}" if train_pred else ""
    ta = f"AND s.{train_pred}" if train_pred else ""  # predicate on bare `id`
    iw = f"WHERE {index_where}" if index_where else ""
    sqd = ("list_reduce(list_transform(list_zip({a}, {b}),"
           " q -> (q[1]-q[2]) * (q[1]-q[2])), (x, y) -> x + y)")
    return f"""pts AS (SELECT vec_id AS id, {_V} AS v FROM embeddings),
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('{salt}' || CAST(id AS VARCHAR)), id) - 1 AS j, v
  FROM (SELECT * FROM pts {tw} ORDER BY md5('{salt}' || CAST(id AS VARCHAR)), id LIMIT {k})
),
sspace AS (SELECT unnest(range(0, {m})) AS ss),
cb0 AS (
  SELECT sspace.ss, seeds.j AS cluster,
         seeds.v[sspace.ss*{ds} + 1 : sspace.ss*{ds} + {ds}] AS centroid
  FROM seeds, sspace
),
sub AS (
  SELECT pts.id, sspace.ss,
         pts.v[sspace.ss*{ds} + 1 : sspace.ss*{ds} + {ds}] AS sv
  FROM pts, sspace
),
a1_d AS (
  SELECT s.id, s.ss, s.sv, c.cluster, {sqd.format(a='s.sv', b='c.centroid')} AS sqdist
  FROM sub s JOIN cb0 c ON s.ss = c.ss {ta}
),
a1 AS (
  SELECT id, ss, sv, cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, ss ORDER BY sqdist, cluster) AS rk
    FROM a1_d
  ) WHERE rk = 1
),
u_l AS (
  SELECT ss, cluster, generate_subscripts(sv, 1) AS dim, unnest(sv) AS x FROM a1
),
u_m AS (
  SELECT ss, cluster, dim,
         (SUM(CAST(round(x * {_S6_Q30}) AS BIGINT)) / {_S6_Q30}.0)
           / CAST(COUNT(*) AS DOUBLE) AS mn
  FROM u_l GROUP BY ss, cluster, dim
),
cb1 AS (SELECT ss, cluster, list(mn ORDER BY dim) AS centroid FROM u_m GROUP BY ss, cluster),
a2_d AS (
  SELECT s.id, s.ss, c.cluster, {sqd.format(a='s.sv', b='c.centroid')} AS sqdist
  FROM sub s JOIN cb1 c ON s.ss = c.ss
),
a2 AS (
  SELECT id, ss, cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, ss ORDER BY sqdist, cluster) AS rk
    FROM a2_d
  ) WHERE rk = 1
),
codes AS (SELECT id, list(cluster ORDER BY ss) AS codes FROM a2 {iw} GROUP BY id),
qids AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000),
qsub AS (SELECT q.q_id, s.ss, s.sv AS qsv FROM qids q JOIN sub s ON s.id = q.q_id),
lut_r AS (
  SELECT q.q_id, c.ss, c.cluster,
         CAST(round({_dotp('q.qsv', 'c.centroid')} * {_S6_Q30}) AS BIGINT) AS p
  FROM qsub q JOIN cb1 c ON q.ss = c.ss
),
spine AS (
  SELECT CAST(i // {k} AS INT) AS ss, CAST(i % {k} AS BIGINT) AS cluster
  FROM (SELECT unnest(range(0, {m}*{k})) AS i)
),
lut_d AS (
  SELECT q.q_id, sp.ss, sp.cluster, COALESCE(r.p, 0) AS p
  FROM qids q CROSS JOIN spine sp
  LEFT JOIN lut_r r ON r.q_id = q.q_id AND r.ss = sp.ss AND r.cluster = sp.cluster
),
lut AS (SELECT q_id, list(p ORDER BY ss, cluster) AS lut FROM lut_d GROUP BY q_id),
appr AS (
  SELECT l.q_id, c.id,
         list_reduce(
           list_transform(range(0, {m}),
             ss -> l.lut[ss*{k} + CAST(c.codes[ss + 1] AS INT) + 1]),
           (x, y) -> x + y) AS s
  FROM codes c CROSS JOIN lut l WHERE c.id != l.q_id
),
cand AS (
  SELECT q_id, id AS n_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, id) AS rk
    FROM appr
  ) WHERE rk <= {refine}
),
rer AS (
  SELECT cand.q_id, cand.n_id,
         {_dotp('qp.v', 'np.v')}
           / greatest(sqrt({_sq('qp.v')}) * sqrt({_sq('np.v')}), 1e-12) AS cos
  FROM cand
  JOIN pts qp ON qp.id = cand.q_id
  JOIN pts np ON np.id = cand.n_id
),
ranked AS (
  SELECT q_id, n_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM rer
)"""


def _pq_sql(m: int = _S6_M, k: int = _S6_K, ds: int = _S6_DS,
            refine: int = _S6_REFINE, topk: int = _S6_TOPK,
            salt: str = "pq", train_pred: str = "") -> str:
    return f"""
WITH {_pq_ctes(m=m, k=k, ds=ds, refine=refine, salt=salt,
               train_pred=train_pred)}
SELECT q_id, n_id, cos, rk FROM ranked WHERE rk <= {topk}
ORDER BY q_id, rk
"""


@register("s6_pq_adc_rerank", oracle=_pq_sql(),
          doc="Product-quantization ANN: 8 md5-seeded per-subspace codebooks "
              "(32 centroids x 8 dims, one fixed-point Lloyd pass trained "
              "grouped in two jobs), corpus encoded as 8 codes/vector, ADC "
              "scoring = 8 integer LUT lookups per (query, doc), integer "
              "top-60 -> exact-cosine rerank to top-10 (recall@10 0.76 vs "
              "brute force on the isotropic fixture). Probe budget pinned "
              "at 20 (s1b discipline). Oracle replays codebook training, "
              "encoding, ADC and rerank end to end.",
          tags=("similarity", "bench"))
def s6_pq_adc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.similarity import pq_adc_rerank

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return pq_adc_rerank(
        e, q, m=_S6_M, k=_S6_K, refine=_S6_REFINE, topk=_S6_TOPK, salt="pq"
    ).orderBy("q_id", "rk")


# --- S7: IVF-PQ ANN (coarse cells + residual product quantization) ----------
# The full faiss IndexIVFPQ shape, completing the ladder brute → LSH
# → IVF → SQ8 → PQ → IVF-PQ: coarse md5-seeded quantizer partitions
# the corpus, vectors are PQ-encoded on their RESIDUALS (residuals
# concentrate near zero, so the shared codebooks spend resolution
# where the data is), a query probes nprobe cells and scores ONLY
# their members via per-(query, cell) ADC tables built from the
# query residual. Deterministic end to end; the oracle replays the
# coarse Lloyd pass, residuals, PQ training, encoding, probing, ADC,
# and the exact-cosine rerank.

# nprobe=4 (r10): recall@10 is PROBE-bound on the isotropic fixture,
# not ADC-bound — measured exact-cosine-within-probed-cells ceilings
# 0.48/0.52 (nprobe=2) vs 0.70/0.76 (nprobe=4) at sf0.001/sf0.01,
# with the negated-L2 ADC reaching ~96% of whichever ceiling. The
# r9 advice fixed the ADC form (dot(q_res, x̂_res) -> faiss
# -||q_res - centroid||² per subspace); the remaining gap was cells.
_S7_KC, _S7_NPROBE = 8, 4
_S7_M, _S7_K, _S7_DS = 8, 32, 8
# refine=120 (r10): with nprobe=4 the ADC scans 2x the candidates, so
# the integer head doubles too — measured recall@10 0.58/0.54 at
# refine=60 vs 0.70/0.74 at refine=120 (the ceiling); refine=200 adds
# nothing (0.70/0.76). Cost is Q*refine rerank rows only.
_S7_REFINE, _S7_TOPK = 120, 10


def _s7_sql(salt: str = "ivfpq", train_pred: str = "") -> str:
    m, k, ds = _S7_M, _S7_K, _S7_DS
    q30 = _S6_Q30
    # train_pred (predicate on bare `id`): restricts which vectors
    # train BOTH quantizers (coarse seeds + Lloyd pass, PQ seeds +
    # Lloyd pass); assignment/encoding/serving always covers every
    # vector — the s7i incremental-append replay (see _pq_sql).
    tsrc = "tpts" if train_pred else "pts"
    tw = f"WHERE {train_pred}" if train_pred else ""
    ta = f"AND s.{train_pred}" if train_pred else ""
    tpts_cte = (
        f"tpts AS (SELECT * FROM pts WHERE {train_pred}),\n" if train_pred else ""
    )
    tres_src = (
        f"(SELECT * FROM res WHERE {train_pred})" if train_pred else "res"
    )
    sqd = ("list_reduce(list_transform(list_zip({a}, {b}),"
           " q -> (q[1]-q[2]) * (q[1]-q[2])), (x, y) -> x + y)")
    return f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS vec FROM embeddings),
{tpts_cte}init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('{salt}' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts {tw} ORDER BY md5('{salt}' || CAST(id AS VARCHAR)), id LIMIT {_S7_KC})
),
{_assign_cte(tsrc, 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
res AS (
  SELECT a2.id, a2.cluster AS cell, a2.vec AS ov,
         list_transform(list_zip(a2.vec, c.centroid), p -> p[1] - p[2]) AS v
  FROM a2 JOIN c1 c ON a2.cluster = c.cluster
),
pseeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('{salt}c' || CAST(id AS VARCHAR)), id) - 1 AS j, v
  FROM (SELECT * FROM {tres_src} ORDER BY md5('{salt}c' || CAST(id AS VARCHAR)), id LIMIT {k})
),
sspace AS (SELECT unnest(range(0, {m})) AS ss),
pcb0 AS (
  SELECT sspace.ss, pseeds.j AS cluster,
         pseeds.v[sspace.ss*{ds} + 1 : sspace.ss*{ds} + {ds}] AS centroid
  FROM pseeds, sspace
),
psub AS (
  SELECT res.id, sspace.ss,
         res.v[sspace.ss*{ds} + 1 : sspace.ss*{ds} + {ds}] AS sv
  FROM res, sspace
),
p1_d AS (
  SELECT s.id, s.ss, s.sv, c.cluster, {sqd.format(a='s.sv', b='c.centroid')} AS sqdist
  FROM psub s JOIN pcb0 c ON s.ss = c.ss {ta}
),
p1 AS (
  SELECT id, ss, sv, cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, ss ORDER BY sqdist, cluster) AS rk
    FROM p1_d
  ) WHERE rk = 1
),
pu_l AS (SELECT ss, cluster, generate_subscripts(sv, 1) AS dim, unnest(sv) AS x FROM p1),
pu_m AS (
  SELECT ss, cluster, dim,
         (SUM(CAST(round(x * {q30}) AS BIGINT)) / {q30}.0) / CAST(COUNT(*) AS DOUBLE) AS mn
  FROM pu_l GROUP BY ss, cluster, dim
),
pcb1 AS (SELECT ss, cluster, list(mn ORDER BY dim) AS centroid FROM pu_m GROUP BY ss, cluster),
p2_d AS (
  SELECT s.id, s.ss, c.cluster, {sqd.format(a='s.sv', b='c.centroid')} AS sqdist
  FROM psub s JOIN pcb1 c ON s.ss = c.ss
),
p2 AS (
  SELECT id, ss, cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, ss ORDER BY sqdist, cluster) AS rk
    FROM p2_d
  ) WHERE rk = 1
),
codes AS (SELECT id, list(cluster ORDER BY ss) AS codes FROM p2 GROUP BY id),
coded AS (SELECT codes.id, res.cell, codes.codes FROM codes JOIN res ON codes.id = res.id),
qids AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000),
qv AS (SELECT q.q_id, p.vec AS q_vec FROM qids q JOIN pts p ON p.id = q.q_id),
qd AS (
  SELECT qv.q_id, qv.q_vec, c.cluster AS cell, c.centroid,
         {sqd.format(a='qv.q_vec', b='c.centroid')} AS cdist
  FROM qv CROSS JOIN c1 c
),
probes AS (
  SELECT q_id, cell,
         list_transform(list_zip(q_vec, centroid), p -> p[1] - p[2]) AS q_res
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cdist, cell) AS rk FROM qd
  ) WHERE rk <= {_S7_NPROBE}
),
qsub AS (
  SELECT probes.q_id, probes.cell, sspace.ss,
         probes.q_res[sspace.ss*{ds} + 1 : sspace.ss*{ds} + {ds}] AS qsv
  FROM probes, sspace
),
lut_r AS (
  SELECT q.q_id, q.cell, c.ss, c.cluster,
         CAST(round(-({sqd.format(a='q.qsv', b='c.centroid')}) * {q30}) AS BIGINT) AS p
  FROM qsub q JOIN pcb1 c ON q.ss = c.ss
),
spine AS (
  SELECT CAST(i // {k} AS INT) AS ss, CAST(i % {k} AS BIGINT) AS cluster
  FROM (SELECT unnest(range(0, {m}*{k})) AS i)
),
lut_d AS (
  SELECT pc.q_id, pc.cell, sp.ss, sp.cluster, COALESCE(r.p, 0) AS p
  FROM (SELECT q_id, cell FROM probes) pc CROSS JOIN spine sp
  LEFT JOIN lut_r r ON r.q_id = pc.q_id AND r.cell = pc.cell
                    AND r.ss = sp.ss AND r.cluster = sp.cluster
),
lut AS (SELECT q_id, cell, list(p ORDER BY ss, cluster) AS lut FROM lut_d GROUP BY q_id, cell),
appr AS (
  SELECT l.q_id, c.id,
         list_reduce(
           list_transform(range(0, {m}),
             ss -> l.lut[ss*{k} + CAST(c.codes[ss + 1] AS INT) + 1]),
           (x, y) -> x + y) AS s
  FROM coded c JOIN lut l ON c.cell = l.cell AND c.id != l.q_id
),
cand AS (
  SELECT q_id, id AS n_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, id) AS rk
    FROM appr
  ) WHERE rk <= {_S7_REFINE}
),
rer AS (
  SELECT cand.q_id, cand.n_id,
         {_dotp('qp.vec', 'np.vec')}
           / greatest(sqrt({_sq('qp.vec')}) * sqrt({_sq('np.vec')}), 1e-12) AS cos
  FROM cand
  JOIN pts qp ON qp.id = cand.q_id
  JOIN pts np ON np.id = cand.n_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM rer
) WHERE rk <= {_S7_TOPK}
ORDER BY q_id, rk
"""


@register("s7_ivfpq_adc_rerank", oracle=_s7_sql(),
          doc="IVF-PQ ANN: md5-seeded coarse quantizer (8 cells, one Lloyd "
              "pass), residual-encoded PQ codes (8 subspaces x 32 "
              "centroids), nprobe=4 probed cells, per-(query, cell) "
              "negated-L2 ADC tables (faiss IndexIVFPQ form: "
              "-||q_res_ss - centroid||² per subspace, integer Q30), "
              "integer top-120 -> exact-cosine rerank to top-10. Recall@10 "
              "0.70 vs brute force (= the nprobe=4 exact-cosine ceiling; "
              "ADC is ~96% of ceiling — recall is probe-bound on the "
              "isotropic fixture). Probe budget pinned at 20 (s1b "
              "discipline). Oracle replays the whole index build and "
              "search end to end.",
          tags=("similarity", "bench"))
def s7_ivfpq_adc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.similarity import ivfpq_adc_rerank

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return ivfpq_adc_rerank(
        e, q, k_coarse=_S7_KC, nprobe=_S7_NPROBE, m=_S7_M, k=_S7_K,
        refine=_S7_REFINE, topk=_S7_TOPK, salt="ivfpq",
    ).orderBy("q_id", "rk")


# --- S6q/S7q: index BUILD/SERVE split (the deployed retrieval shape) --------
# s6/s7 retrain codebooks and re-encode the corpus inside every query
# — right for an oracle that replays the whole pipeline, wrong as the
# per-query cost model: at 100 TB the index is built ONCE (a batch
# job) and every search touches only the model-sized artifacts
# (broadcast) plus the code-table scan. These rows register that
# serving path: ensure_* builds the index on first use (content-
# addressed by params + dataset fingerprint, so a regenerated dataset
# rebuilds instead of serving stale artifacts), and the QUERY plan
# contains no training term — its bench/scale-leg wall measures the
# scanned-index + rerank cost a deployed pipeline actually pays
# per query. Training is bit-deterministic and parquet round-trips
# doubles/longs exactly, so serve-from-artifact equals
# train-and-serve: the SAME oracle SQL (full build+serve replay)
# value-hash-gates the stored artifact.

@register("s6q_pq_serve", oracle=_pq_sql(),
          doc="PQ-ADC search against a PERSISTED index (build/serve split): "
              "codebooks trained once via ensure_pq_index (content-addressed "
              "artifact under .artifacts/ann), query plan = broadcast "
              "codebook + codes-table ADC scan (8 int lookups/doc) + exact "
              "rerank of Q*60 rows. Same oracle as s6 — the value hash "
              "proves the stored artifact equals the oracle's replayed "
              "training bit-for-bit. Bench wall = per-query serving cost "
              "only (the 100-TB cost model).",
          tags=("similarity", "bench"))
def s6q_pq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import (
        ensure_pq_index,
        pq_serve_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    path = ensure_pq_index(e, m=_S6_M, k=_S6_K, salt="pq")
    return pq_serve_topk(
        e, q, path, m=_S6_M, k=_S6_K, refine=_S6_REFINE, topk=_S6_TOPK
    ).orderBy("q_id", "rk")


# --- S6r: serve with the refine ~ N rule (the recall knob at scale) --------
# Fixed refine decays recall with corpus size (measured at 1000x:
# 0.53 -> 0.13 @ refine=60; 0.69 restored @ refine=6000 — recall
# tracks the refine FRACTION of the corpus on structure-free
# embeddings, SCALE.md r10 / SCALE_SPOT_r10.ann_recall_1000x). This
# row makes the rule first-class: refine = max(60, ceil(N / 333)) —
# ~0.3% of the corpus — computed by integer ceil-div on BOTH sides
# (same in-SQL-rule discipline as pipe4b's bits = f(N)). The rerank
# stays Q x refine exact-cosine rows: trivial next to the ADC scan.

_S6R_SQL = _pq_sql(
    refine="greatest(60, ((SELECT COUNT(*) FROM embeddings) + 332) // 333)"
)


@register("s6r_pq_serve_scaled", oracle=_S6R_SQL,
          doc="PQ-ADC serve with the corpus-following refine rule "
              "(max(60, ceil(N/333)) ~ 0.3% of the corpus): the recall "
              "knob a growing deployment turns instead of rebuilding the "
              "index. Same persisted artifact and oracle family as s6q; "
              "the integer refine rule is replayed in-SQL.",
          tags=("similarity",))
def s6r_pq_serve_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import (
        ensure_pq_index,
        pq_serve_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    n = e.count()
    refine = max(_S6_REFINE, (n + 332) // 333)
    path = ensure_pq_index(e, m=_S6_M, k=_S6_K, salt="pq")
    return pq_serve_topk(
        e, q, path, m=_S6_M, k=_S6_K, refine=refine, topk=_S6_TOPK
    ).orderBy("q_id", "rk")



@register("s7q_ivfpq_serve", oracle=_s7_sql(),
          doc="IVF-PQ search against a PERSISTED index (build/serve split): "
              "coarse centroids + residual codebooks broadcast from the "
              "artifact, (cell, codes) scan restricted to nprobe=4 probed "
              "cells, negated-L2 ADC, exact rerank of Q*120 rows. Same "
              "oracle as s7 (full build+serve replay) — the value hash "
              "gates the stored artifact. Bench wall = per-query serving "
              "cost only.",
          tags=("similarity", "bench"))
def s7q_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import (
        ensure_ivfpq_index,
        ivfpq_serve_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    path = ensure_ivfpq_index(e, k_coarse=_S7_KC, m=_S7_M, k=_S7_K, salt="ivfpq")
    return ivfpq_serve_topk(
        e, q, path, m=_S7_M, k=_S7_K, nprobe=_S7_NPROBE,
        refine=_S7_REFINE, topk=_S7_TOPK,
    ).orderBy("q_id", "rk")


# --- S8: truncated-prefix coarse-to-fine retrieval ---------------------------
# The Matryoshka/adaptive-retrieval serving pattern as a first-class
# oracled row: stage 1 scans the corpus with cosine over only the
# FIRST 32 of 64 dimensions (a prefix slice — with MRL-style
# embeddings the prefix is itself a valid lower-dim embedding) and
# keeps a 100-candidate shortlist per query; stage 2 reranks the
# shortlist with full-width exact cosine, top-10 out. The corpus
# scan does 1/2 of the arithmetic of s1's brute force (and, with a
# stored truncated copy, 1/2 of the IO); full vectors are touched
# for Q×100 rows only. Probes are the s1b fixed 20-probe budget, so
# the bench growth column measures the scan, not probe count.
# Both stages are slices + sequential-fold cosines: the oracle
# replays the cascade bit-for-bit, including the shortlist cut.
#
# Config note: the fixture embeddings are NOT Matryoshka-trained, so
# a raw prefix keeps only ~trunc/d of the signal — measured recall
# vs brute force: 16/50 → 0.40-0.50, 32/100 → 0.90-0.96 (sf0.001/
# sf0.01). 32/100 is the honest setting here; with MRL embeddings
# the 16-dim prefix would carry most of the similarity and the same
# cascade runs at 1/4 cost. tests/test_r10b_surface.py pins the 0.8
# recall floor.

_S8_TRUNC, _S8_SHORT, _S8_K = 32, 100, 10


def _trunc(a: str) -> str:
    return f"({a}[1:{_S8_TRUNC}])"


_S8_SQL = f"""
WITH e AS (SELECT vec_id, {_V} AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e
      WHERE vec_id % 100 = 0 AND vec_id < 2000),
coarse AS (
  SELECT q.q_id, e.vec_id AS n_id, e.v, q.qv,
         {_dotp(_trunc('q.qv'), _trunc('e.v'))}
           / greatest(sqrt({_sq(_trunc('q.qv'))}) * sqrt({_sq(_trunc('e.v'))}), 1e-12) AS cos_t
  FROM q JOIN e ON e.vec_id != q.q_id
),
short AS (
  SELECT q_id, n_id, v, qv FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_t DESC, n_id) AS rk_t
    FROM coarse
  ) WHERE rk_t <= {_S8_SHORT}
),
fine AS (
  SELECT q_id, n_id,
         {_dotp('qv', 'v')} / greatest(sqrt({_sq('qv')}) * sqrt({_sq('v')}), 1e-12) AS cos
  FROM short
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM fine
) WHERE rk <= {_S8_K}
ORDER BY q_id, rk
"""


@register("s8_truncated_rerank", oracle=_S8_SQL,
          doc="Matryoshka-style coarse-to-fine retrieval: 32-dim prefix "
              "cosine scan -> 100-candidate shortlist -> full 64-dim exact "
              "rerank, top-10 (recall 0.90-0.96 vs brute force on the "
              "non-MRL fixtures). 1/2 of brute-force scan arithmetic; full "
              "vectors touched for QxSHORTLIST rows only; fixed 20-probe "
              "budget (the s1b protocol).",
          tags=("similarity", "bench"))
def s8_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.similarity import truncated_rerank_topk

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return truncated_rerank_topk(
        e, q, trunc_dim=_S8_TRUNC, shortlist=_S8_SHORT, k=_S8_K
    ).orderBy("q_id", "rk")


# --- S9: retrieval-quality metrics (recall@k / MRR / nDCG) -------------------
# The evaluation harness the ANN family reports through, as a
# first-class oracled row instead of ad-hoc test arithmetic: the
# cascade retriever (s8) is scored against exact brute force (s1b,
# same fixed 20-probe budget) with the three standard metrics —
# recall@10, reciprocal rank of the first relevant hit, and binary-
# relevance nDCG@10. Per-query rows, so regressions localize.
#
# Exactness: recall and RR divide exact integers; DCG takes a
# non-correctly-rounded ln per hit, so each term is Q30-quantized
# before the per-query sum (the t14 discipline) and the final ratio
# is rounded to 6 decimals. The ideal-DCG mass for 10 binary-
# relevant positions is pinned as a PROTOCOL CONSTANT (the Q30 fold
# of ln2/ln(k+1), k=1..10) so both engines divide by the identical
# integer rather than re-deriving it through their own libm.
#
# Scale shape: two already-audited retrieval plans + one rank-join on
# (q_id, n_id) (Q×10 rows a side) + a q_id-keyed aggregate — the
# evaluation itself is probe-bounded at any corpus size.

_LN2 = 0.6931471805599453
_S9_IDCG_Q30 = 4878609691  # sum_{k=1..10} round(ln2/ln(k+1) * 2^30)

_S9_SQL = f"""
WITH truth AS (SELECT * FROM ({_S1B_SQL})),
sys AS (SELECT * FROM ({_S8_SQL})),
hits AS (
  SELECT s.q_id, s.rk AS srk
  FROM sys s JOIN truth t ON s.q_id = t.q_id AND s.n_id = t.n_id
),
m AS (
  SELECT q_id,
         COUNT(*) AS n_hit,
         MIN(srk) AS first_rel,
         SUM(CAST(round({_LN2} / ln(srk + 1) * 1073741824) AS BIGINT)) AS dcg_q
  FROM hits GROUP BY q_id
),
probes AS (SELECT DISTINCT q_id FROM truth)
SELECT p.q_id,
       CAST(COALESCE(m.n_hit, 0) AS BIGINT) AS n_hit,
       COALESCE(m.n_hit, 0) / 10.0 AS recall_at_10,
       CASE WHEN m.first_rel IS NOT NULL THEN 1.0 / m.first_rel ELSE 0.0 END AS rr,
       round(COALESCE(m.dcg_q, 0) / {_S9_IDCG_Q30}.0, 6) AS ndcg_at_10
FROM probes p LEFT JOIN m ON p.q_id = m.q_id
ORDER BY p.q_id
"""


@register("s9_retrieval_metrics", oracle=_S9_SQL,
          doc="Retrieval evaluation as an oracled row: s8's cascade vs "
              "s1b exact brute force — per-query recall@10, MRR and "
              "binary nDCG@10 (Q30-quantized DCG terms, protocol-constant "
              "ideal mass). Probe-bounded work at any corpus size.",
          tags=("similarity", "quality"))
def s9_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.similarity import (
        brute_force_topk,
        truncated_rerank_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    truth = brute_force_topk(e, q, k=10)
    sys = truncated_rerank_topk(
        e, q, trunc_dim=_S8_TRUNC, shortlist=_S8_SHORT, k=_S8_K
    )
    hits = sys.select("q_id", "n_id", F.col("rk").alias("srk")).join(
        truth.select("q_id", "n_id"), ["q_id", "n_id"]
    )
    m = hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min("srk").alias("first_rel"),
        F.sum(
            F.round(F.lit(_LN2) / F.log(F.col("srk") + 1) * F.lit(1073741824))
            .cast("long")
        ).alias("dcg_q"),
    )
    probes = truth.select("q_id").distinct()
    return (
        probes.join(m, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0).cast("long")) / F.lit(10.0)).alias(
                "recall_at_10"
            ),
            F.when(
                F.col("first_rel").isNotNull(), F.lit(1.0) / F.col("first_rel")
            )
            .otherwise(F.lit(0.0))
            .alias("rr"),
            F.round(
                F.coalesce("dcg_q", F.lit(0).cast("long"))
                / F.lit(float(_S9_IDCG_Q30)),
                6,
            ).alias("ndcg_at_10"),
        )
        .orderBy("q_id")
    )


# --- S6i: incremental index append (the faiss add() pattern) -----------------
# How a deployed vector index actually grows: the base corpus (here
# vec_id % 5 != 0, 80%) trains the codebooks ONCE; the arriving batch
# (vec_id % 5 == 0) is encoded under those FROZEN codebooks and its
# codes are APPENDED as a separate parquet increment — work ∝ batch,
# no retraining, no rewrite of existing codes (the
# pipe5_incremental_dedup discipline applied to the ANN family).
# Serving scans the union of base + increment code tables.
# The oracle replays the exact lifecycle: codebooks trained from the
# base subset only (train_pred), assignment/encoding over ALL ids —
# which is precisely what build-then-append produces — then the
# standard ADC + rerank. The value hash therefore proves the appended
# artifact equals a from-scratch base-trained encode bit-for-bit.

_S6I_PRED = "id % 5 != 0"


@register("s6i_pq_append_serve",
          oracle=_pq_sql(salt="pqi", train_pred=_S6I_PRED),
          doc="Incremental PQ index: codebooks trained on the 80% base "
              "corpus, the 20% batch encoded under FROZEN codebooks and "
              "appended as a codes increment (idempotent per tag); serve "
              "scans base+increment. Oracle replays train-on-base/"
              "encode-all end-to-end — the faiss add() lifecycle under "
              "the value-hash gate.",
          tags=("similarity",))
def s6i_pq_append_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import (
        _build_once,
        append_to_pq_index,
        build_pq_index,
        index_dir,
        pq_serve_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "pq", "m": _S6_M, "k": _S6_K, "salt": "pqi",
              "train": "mod5"}
    path = index_dir(base, "pq", params)
    _build_once(path, lambda p: build_pq_index(base, p, m=_S6_M, k=_S6_K,
                                               salt="pqi"))
    append_to_pq_index(batch, path, tag="mod5batch")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return pq_serve_topk(
        e, q, path, m=_S6_M, k=_S6_K, refine=_S6_REFINE, topk=_S6_TOPK
    ).orderBy("q_id", "rk")


# --- S7i: incremental IVF-PQ append ------------------------------------------
# s6i's lifecycle on the index family a 100-TB deployment actually
# runs: coarse cells + residual codebooks trained once on the 80%
# base; the arriving batch is assigned to its nearest FROZEN cell,
# residualized, encoded under the FROZEN residual codebooks and
# appended as a (id, cell, codes) increment. Serving probes cells
# over the base∪increment union. Oracle: both quantizers trained
# from the base subset (train_pred), assignment/encoding over all —
# exactly what build-then-append produces.


@register("s7i_ivfpq_append_serve",
          oracle=_s7_sql(salt="ivfpqi", train_pred=_S6I_PRED),
          doc="Incremental IVF-PQ index: coarse+residual quantizers "
              "trained on the 80% base, the 20% batch cell-assigned and "
              "encoded under FROZEN artifacts, appended as a codes "
              "increment; serve probes nprobe=4 cells over the union. "
              "Oracle replays train-on-base/encode-all end-to-end.",
          tags=("similarity",))
def s7i_ivfpq_append_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import (
        _build_once,
        append_to_ivfpq_index,
        build_ivfpq_index,
        index_dir,
        ivfpq_serve_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "ivfpq", "k_coarse": _S7_KC, "m": _S7_M, "k": _S7_K,
              "salt": "ivfpqi", "train": "mod5"}
    path = index_dir(base, "ivfpq", params)
    _build_once(path, lambda p: build_ivfpq_index(
        base, p, k_coarse=_S7_KC, m=_S7_M, k=_S7_K, salt="ivfpqi"
    ))
    append_to_ivfpq_index(batch, path, tag="mod5batch")
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return ivfpq_serve_topk(
        e, q, path, m=_S7_M, k=_S7_K, nprobe=_S7_NPROBE,
        refine=_S7_REFINE, topk=_S7_TOPK,
    ).orderBy("q_id", "rk")


# --- S6d: index quantization-drift report ------------------------------------
# The monitoring row an incremental index NEEDS next to its append
# path: appends are encoded under FROZEN codebooks (s6i), so a batch
# drawn from a drifted distribution degrades quantization SILENTLY —
# serve wall stays flat (same code-table scan) while ADC ranking
# quality decays. The observable is per-segment mean PQ residual
# energy ||v - v̂||² (v̂ = concatenation of the assigned centroids):
# codebooks minimize it over the TRAINING distribution, so an
# appended segment whose mean residual rises well above the base's
# is quantized by the wrong codebooks. The rebuild trigger rule
# (SCALE.md): retrain when appended/base mean-residual ratio exceeds
# 1.5 — on the isotropic fixture the in-distribution ratio is ~1.0,
# and tests/test_r11_surface.py pins that a deliberately SHIFTED
# batch crosses the trigger while wall-identical serving hides it.
#
# Engine shape: one scan of the STORED artifact (codes m small ints/
# vector, codebook broadcast) + the original vectors — work ∝ corpus
# with zero shuffles beyond the id-keyed residual sum; the report is
# a 2-row aggregate. Exactness: per-(id, subspace) residual is the
# same sequential fold as the oracle's list_reduce, Q30-quantized
# before the per-id and per-segment sums (the t14 discipline).

_S6D_SQL = f"""
WITH {_pq_ctes(salt="pqi", train_pred=_S6I_PRED)},
a2min AS (
  SELECT id, ss, sqdist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, ss ORDER BY sqdist, cluster) AS rk
    FROM a2_d
  ) WHERE rk = 1
),
perv AS (
  SELECT id, SUM(CAST(round(sqdist * {_S6_Q30}) AS BIGINT)) AS e_q
  FROM a2min GROUP BY id
)
SELECT CASE WHEN id % 5 = 0 THEN 'appended' ELSE 'base' END AS segment,
       COUNT(*) AS n_vecs,
       round(SUM(e_q) / (COUNT(*) * {_S6_Q30}.0), 6) AS mean_residual_energy
FROM perv GROUP BY 1 ORDER BY 1
"""


def pq_residual_report(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    segment_col,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(segment, n_vecs, mean_residual_energy) for a stored PQ index:
    every vector's ADC reconstruction residual against the FROZEN
    codebooks, aggregated by ``segment_col`` (a Column over the id).
    The drift monitor behind s6d — also callable on a live index with
    an epoch/batch segment column."""
    import os

    from ae_data_integration_spark.functions.arrays import to_double
    from ae_data_integration_spark.operators.ann_index import _code_dirs
    from ae_data_integration_spark.operators.similarity import (
        _sqdist_unrolled,
        _vec_dim,
        _widen,
    )

    d = _vec_dim(emb, vec_col)
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    m = cb1.select(F.max("ss")).collect()[0][0] + 1
    ds = d // m
    codes = _widen(spark.read.parquet(*_code_dirs(path))).select(
        "id", F.posexplode("codes").alias("ss", "cluster")
    )
    pts = _widen(
        emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("v"))
    )
    sub = pts.select(
        "id",
        F.posexplode(
            F.array(*[F.slice("v", ss * ds + 1, ds) for ss in range(m)])
        ).alias("ss", "sv"),
    )
    rec = (
        sub.join(codes, ["id", "ss"])
        .join(F.broadcast(cb1), ["ss", "cluster"])
        .withColumn(
            "e_q",
            F.round(_sqdist_unrolled("sv", "centroid", ds) * F.lit(float(_S6_Q30)))
            .cast("long"),
        )
        .groupBy("id")
        .agg(F.sum("e_q").alias("e_q"))
    )
    return (
        rec.withColumn("segment", segment_col)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("e_q") / (F.count(F.lit(1)) * F.lit(float(_S6_Q30))), 6
            ).alias("mean_residual_energy"),
        )
        .orderBy("segment")
    )


@register("s6d_index_drift", oracle=_S6D_SQL,
          doc="Quantization-drift monitor for the incremental PQ index: "
              "per-segment (base vs appended) mean ADC reconstruction "
              "residual energy against the FROZEN codebooks, from one "
              "scan of the stored codes + vectors. The rebuild trigger "
              "(appended/base ratio > 1.5) is the rule that catches "
              "silent recall decay under distribution drift — serve "
              "wall stays flat while this rises.",
          tags=("similarity", "quality"))
def s6d_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.ann_index import (
        _build_once,
        append_to_pq_index,
        build_pq_index,
        index_dir,
    )

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "pq", "m": _S6_M, "k": _S6_K, "salt": "pqi",
              "train": "mod5"}
    path = index_dir(base, "pq", params)
    _build_once(path, lambda p: build_pq_index(base, p, m=_S6_M, k=_S6_K,
                                               salt="pqi"))
    append_to_pq_index(batch, path, tag="mod5batch")
    seg = F.when(F.col("id") % 5 == 0, F.lit("appended")).otherwise(
        F.lit("base")
    )
    return pq_residual_report(spark, e, path, seg)


# --- S10: hard-negative mining (contrastive pair curation) -------------------
# The pair-mining step of contrastive training-data preparation:
# for each probe, the top-10 corpus vectors by cosine whose LANGUAGE
# differs from the probe's (labels via the aligned documents row) —
# nearest lookalikes from the wrong class are the hardest negatives.
# s1b's fixed 20-probe protocol, so scale growth isolates the labeled
# corpus scan; the label inequality is fused into the broadcast-join
# predicate, never a post-scan filter stage.

_S10_SQL = f"""
WITH e AS (SELECT vec_id, {_V} AS v FROM embeddings),
lab AS (SELECT doc_id AS vec_id, lang FROM documents),
el AS (SELECT e.vec_id, e.v, l.lang FROM e JOIN lab l USING (vec_id)),
q AS (
  SELECT vec_id AS q_id, v AS qv, lang AS q_lang FROM el
  WHERE vec_id % 100 = 0 AND vec_id < 2000
),
scored AS (
  SELECT q.q_id, e.vec_id AS n_id, e.lang AS n_lang,
         {_dotp('q.qv', 'e.v')} / greatest(sqrt({_sq('q.qv')}) * sqrt({_sq('e.v')}), 1e-12) AS cos
  FROM q JOIN el e ON e.vec_id != q.q_id AND e.lang != q.q_lang
)
SELECT q_id, n_id, n_lang, cos, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM scored
) WHERE rk <= 10
ORDER BY q_id, rk
"""


@register("s10_hard_negatives", oracle=_S10_SQL,
          doc="Contrastive hard-negative mining: per fixed probe, exact "
              "top-10 cosine neighbors with a DIFFERENT language label "
              "(labels joined from the aligned documents table); label "
              "inequality fused into the broadcast-join predicate.",
          tags=("similarity", "sampling"))
def s10_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.similarity import (
        hard_negative_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    d = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    el = e.join(d, "vec_id")
    q = el.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return hard_negative_topk(el, q, k=10).orderBy("q_id", "rk")


# --- S11: metadata-filtered ANN ---------------------------------------------
# Filtered vector search — the serving shape every retrieval stack
# needs ("nearest neighbors WHERE label is even"): the metadata
# predicate lands on the CANDIDATE side before any distance math, so
# Catalyst pushes it into the parquet scan (plan-asserted in
# tests/test_r12_surface.py) and the broadcast-probe join scans only
# qualifying vectors — pre-filtering, not post-filtering, which
# would silently return < k rows whenever the predicate thins the
# neighborhood. Fixed 20-probe budget (the s1b discipline) so scale
# legs measure the filtered scan. The IVF/PQ ladder composes the
# same way: bucket assignment is row-local, so the predicate rides
# into the coarse-bucket scan unchanged.

_S11_SQL = _S1_SQL.replace(
    "WHERE vec_id % 100 = 0", "WHERE vec_id % 100 = 0 AND vec_id < 2000"
).replace(
    "FROM q JOIN e ON e.vec_id != q.q_id",
    "FROM q JOIN (SELECT e.*, b.label FROM e JOIN embeddings b USING (vec_id)"
    " WHERE b.label % 2 = 0) e ON e.vec_id != q.q_id",
)


@register("s11_filtered_ann", oracle=_S11_SQL,
          doc="Pre-filtered exact ANN: cosine top-10 per probe over only "
              "label-even candidate vectors — predicate pushed into the "
              "candidate scan below the broadcast-probe join, never "
              "post-filtered out of a computed top-k.",
          tags=("similarity", "bench"))
def s11_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    cand = e.filter(F.col("label") % 2 == 0)
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return brute_force_topk(cand, q, k=10).orderBy("q_id", "rk")
