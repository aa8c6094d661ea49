"""Clustering queries (SURVEY §2.8 C1/C5).

c1_kmeans_relational is the deterministic Lloyd's unroll — the whole
algorithm (seeded init, assignment, centroid update ×2, final
assignment) is replayed by the DuckDB oracle CTE-for-CTE, making this
one of the strongest cross-engine checks in the catalog. The MLlib
twin is rows-only (k-means|| init is engine-internal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import ALIASES, register
from ae_data_integration_spark.functions.portable import Q30, Q40, fpsum, fpsum_sql
from ae_data_integration_spark.operators.kmeans import (
    ch_dbi,
    kmeans_mllib,
    kmeans_relational,
    silhouette_cosine,
    silhouette_cosine_exact,
)
from ae_data_integration_spark.tables import table

_K, _ITER = 5, 2
_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sqd(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" q -> (q[1]-q[2]) * (q[1]-q[2])), (x, y) -> x + y)"
    )


def _assign_cte(pts: str, cents: str, out: str) -> str:
    return f"""{out}_d AS (
  SELECT p.id, p.vec, c.cluster, {_sqd('p.vec', 'c.centroid')} AS sqd
  FROM {pts} p CROSS JOIN {cents} c
),
{out} AS (
  SELECT id, vec, cluster, sqd FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY sqd, cluster) AS rk FROM {out}_d
  ) WHERE rk = 1
)"""


def _update_cte(assigned: str, out: str) -> str:
    return f"""{out}_l AS (
  SELECT cluster, generate_subscripts(vec, 1) AS dim, unnest(vec) AS x FROM {assigned}
),
{out}_m AS (
  SELECT cluster, dim,
         (SUM(CAST(round(x * {Q30}) AS BIGINT)) / {Q30}.0) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM {out}_l GROUP BY cluster, dim
),
{out} AS (
  SELECT cluster, list(m ORDER BY dim) AS centroid FROM {out}_m GROUP BY cluster
)"""


_C1_SQL = f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS vec FROM embeddings),
init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('km' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts ORDER BY md5('km' || CAST(id AS VARCHAR)), id LIMIT {_K})
),
{_assign_cte('pts', 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
{_update_cte('a2', 'c2')},
{_assign_cte('pts', 'c2', 'a3')}
SELECT cluster, COUNT(*) AS n,
       (SUM(CAST(round(sqd * {Q30}) AS BIGINT)) / {Q30}.0) AS total_sqdist
FROM a3 GROUP BY cluster ORDER BY cluster
"""


@register("y_c1_kmeans_relational", oracle=_C1_SQL,
          doc="Lloyd's KMeans unrolled as DataFrame ops (md5 init, 2 iters); "
              "oracle replays the whole algorithm (ref mocss.py:409).",
          tags=("clustering", "bench"))
def c1_kmeans_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    assigned = kmeans_relational(e, k=_K, n_iter=_ITER, salt="km")
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fpsum("sqdist", Q30).alias("total_sqdist"),
        )
        .orderBy("cluster")
    )


def _check_mllib_wcss(sdf, spark, sf_dir: str) -> str:
    """Semantic contract: MLlib's clustering quality must bracket the
    oracled relational twin's near-converged WCSS at the same k.
    k-means|| + full Lloyd convergence can't be much worse than the
    md5-seeded 8-iteration unroll (both minimize WCSS on the same
    data), and can't be dramatically better either — a violation on
    either side means the MLlib path clustered something else
    (wrong column, wrong k, degenerate fit)."""
    from ae_data_integration_spark.operators.kmeans import kmeans_fit

    if len(sdf) != _K:
        return f"expected exactly k={_K} clusters, got {len(sdf)}"
    mllib_wcss = float(sdf["wcss"].sum())
    e = table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(e, k=_K, n_iter=8, salt="km")
    rel_wcss = assigned.agg(fpsum(_SQD_COL, Q30).alias("w")).first()["w"]
    if not (0.3 * rel_wcss <= mllib_wcss <= 1.1 * rel_wcss):
        return (
            f"MLlib WCSS {mllib_wcss:.4f} outside [0.3x, 1.1x] of the "
            f"relational twin's converged WCSS {rel_wcss:.4f}"
        )
    return ""


_SQD_COL = "sqdist"


@register("z_c1_kmeans_mllib", oracle=None,
          doc="MLlib KMeans (k-means||) — production path; no SQL oracle "
              "(internal init is not SQL-replayable) but semantically "
              "contracted: exactly k clusters whose total WCSS brackets "
              "the oracled relational twin's converged WCSS.",
          tags=("clustering",),
          min_rows=5, columns=("cluster", "n", "wcss"),
          check=_check_mllib_wcss)
def c1_kmeans_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return (
        kmeans_mllib(e, k=_K, seed=42, with_sqdist=True)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fpsum(_SQD_COL, Q30).alias("wcss"),
        )
        .orderBy("cluster")
    )


# --- C5: Calinski-Harabasz + Davies-Bouldin over the label clustering -------

_C5_SQL = f"""
WITH pts AS (SELECT label AS c, {_V} AS vec FROM embeddings),
long AS (SELECT c, generate_subscripts(vec, 1) AS dim, unnest(vec) AS x FROM pts),
cent_m AS (
  SELECT c, dim, (SUM(CAST(round(x * {Q30}) AS BIGINT)) / {Q30}.0) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM long GROUP BY c, dim
),
cent AS (SELECT c, list(m ORDER BY dim) AS centroid FROM cent_m GROUP BY c),
gcm AS (
  SELECT dim, (SUM(CAST(round(x * {Q30}) AS BIGINT)) / {Q30}.0) / CAST(COUNT(*) AS DOUBLE) AS g
  FROM long GROUP BY dim
),
gc AS (SELECT list(g ORDER BY dim) AS gcent FROM gcm),
sizes AS (SELECT c, COUNT(*) AS n_c FROM pts GROUP BY c),
tot AS (SELECT COUNT(*) AS n FROM pts),
wdf AS (
  SELECT c,
         (SUM(CAST(round(d2 * {Q30}) AS BIGINT)) / {Q30}.0) AS w_c,
         (SUM(CAST(round(sqrt(d2) * {Q30}) AS BIGINT)) / {Q30}.0) / CAST(COUNT(*) AS DOUBLE) AS s_c
  FROM (SELECT p.c, {_sqd('p.vec', 'ct.centroid')} AS d2 FROM pts p JOIN cent ct ON p.c = ct.c)
  GROUP BY c
),
bdf AS (
  SELECT (SUM(CAST(round((n_c * bd2) * {Q30}) AS BIGINT)) / {Q30}.0) AS B
  FROM (SELECT ct.c, {_sqd('ct.centroid', 'g.gcent')} AS bd2 FROM cent ct CROSS JOIN gc g)
  JOIN sizes USING (c)
),
wtot AS (SELECT (SUM(CAST(round(w_c * {Q30}) AS BIGINT)) / {Q30}.0) AS W, COUNT(*) AS k FROM wdf),
pair AS (
  SELECT (SUM(CAST(round(rmax * {Q30}) AS BIGINT)) / {Q30}.0) / CAST(COUNT(*) AS DOUBLE) AS dbi
  FROM (
    SELECT a.ci, MAX(r) AS rmax FROM (
      SELECT i.c AS ci, (si.s_c + sj.s_c) / sqrt({_sqd('i.centroid', 'j.centroid')}) AS r
      FROM cent i JOIN cent j ON i.c != j.c
      JOIN wdf si ON si.c = i.c
      JOIN wdf sj ON sj.c = j.c
    ) a GROUP BY a.ci
  )
)
SELECT ((B / (k - 1.0)) / (W / CAST(n - k AS DOUBLE))) AS ch, dbi
FROM bdf CROSS JOIN wtot CROSS JOIN tot CROSS JOIN pair
"""


@register("y_c5_ch_dbi", oracle=_C5_SQL,
          doc="Calinski-Harabasz + Davies-Bouldin via centroid aggregates "
              "(ref test_metrics.py:15-17).",
          tags=("clustering", "metrics"))
def c5_ch_dbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return ch_dbi(e, "label", "embedding")


# --- C5b: simplified cosine silhouette --------------------------------------

_DOTP = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
    " (x, y) -> x + y)"
)


def _cosd(a: str, b: str) -> str:
    dot = _DOTP.format(a=a, b=b)
    na = _DOTP.format(a=a, b=a)
    nb = _DOTP.format(a=b, b=b)
    return f"1.0 - ({dot} / greatest(sqrt({na}) * sqrt({nb}), 1e-12))"


_C5S_SQL = f"""
WITH pts AS (SELECT vec_id AS id, label AS c, {_V} AS vec FROM embeddings),
long AS (SELECT c, generate_subscripts(vec, 1) AS dim, unnest(vec) AS x FROM pts),
cent_m AS (
  SELECT c, dim, (SUM(CAST(round(x * {Q30}) AS BIGINT)) / {Q30}.0) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM long GROUP BY c, dim
),
cent AS (SELECT c AS cj, list(m ORDER BY dim) AS centroid FROM cent_m GROUP BY c),
pd AS (
  SELECT p.id, p.c, ct.cj, {_cosd('p.vec', 'ct.centroid')} AS d
  FROM pts p CROSS JOIN cent ct
),
ab AS (
  SELECT id, c,
         MIN(CASE WHEN cj = c THEN d END) AS a,
         MIN(CASE WHEN cj != c THEN d END) AS b
  FROM pd GROUP BY id, c
)
SELECT (SUM(CAST(round(((b - a) / greatest(a, b, 1e-12)) * {Q30}) AS BIGINT)) / {Q30}.0)
         / CAST(COUNT(*) AS DOUBLE) AS silhouette
FROM ab
"""


@register("c5_silhouette", oracle=_C5S_SQL,
          doc="Simplified cosine silhouette via centroid broadcast join — "
              "O(N·k), completes C5 (ref test_metrics.py:15-17).",
          tags=("clustering", "metrics"))
def c5_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return silhouette_cosine(e, "vec_id", "label", "embedding")


# --- C5c: EXACT cosine silhouette (normalized cluster-sum identity) ---------

_C5X_SQL = f"""
WITH pts0 AS (SELECT vec_id AS id, label AS c, {_V} AS vec FROM embeddings),
ptsn AS (
  SELECT id, c, vec,
         greatest(sqrt({_DOTP.format(a='vec', b='vec')}), 1e-12) AS nrm
  FROM pts0
),
long0 AS (
  SELECT c, nrm, generate_subscripts(vec, 1) AS dim, unnest(vec) AS x0 FROM ptsn
),
long AS (SELECT c, dim, x0 / nrm AS x FROM long0),
cs AS (
  SELECT c, dim, {fpsum_sql('x', Q40)} AS s, COUNT(*) AS n_c
  FROM long GROUP BY c, dim
),
cent AS (SELECT c AS cj, list(s ORDER BY dim) AS sarr, MAX(n_c) AS n FROM cs GROUP BY c),
pd AS (
  SELECT p.id, p.c, ct.cj, ct.n,
         {_DOTP.format(a='p.vec', b='ct.sarr')} / p.nrm AS dt,
         {_DOTP.format(a='p.vec', b='p.vec')} / p.nrm / p.nrm AS selfd
  FROM ptsn p CROSS JOIN cent ct
),
ab AS (
  SELECT id, c,
         MIN(CASE WHEN cj = c THEN
               CASE WHEN n = 1 THEN 0.0
                    ELSE (CAST(n - 1 AS DOUBLE) - (dt - selfd)) / CAST(n - 1 AS DOUBLE) END
             END) AS a,
         MIN(CASE WHEN cj != c THEN (CAST(n AS DOUBLE) - dt) / CAST(n AS DOUBLE) END) AS b,
         MAX(CASE WHEN cj = c THEN n END) AS nown
  FROM pd GROUP BY id, c
),
sv AS (
  SELECT CASE WHEN nown = 1 THEN 0.0
              ELSE (b - a) / greatest(a, b, 1e-12) END AS s
  FROM ab
)
SELECT {fpsum_sql('s', Q30)} / CAST(COUNT(*) AS DOUBLE) AS silhouette FROM sv
"""


@register("c5_silhouette_exact", oracle=_C5X_SQL,
          doc="EXACT cosine silhouette via the normalized-vector "
              "cluster-sum identity — one groupBy + broadcast join, "
              "O(N*k*d), no all-pairs pass (ref test_metrics.py:15-17 "
              "silhouette_score(metric='cosine'), exact semantics).",
          tags=("clustering", "metrics", "bench"))
def c5_silhouette_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return silhouette_cosine_exact(e, "vec_id", "label", "embedding")


# --- C2: DBSCAN (ref mocss.py:410; no MLlib counterpart) --------------------

from ae_data_integration_spark.operators.dbscan import dbscan


def _check_c2_partition(sdf, spark, sf_dir: str) -> str:
    """Semantic contract (exact labels are numpy-golden in
    tests/test_dbscan.py; the blocked-numpy ε-kernel may differ from
    the fold-exact twin by an ulp at the eps boundary, so no value
    hash): the histogram must PARTITION the input — cluster sizes sum
    to the row count, every cluster id is -1 (noise) or a point id,
    and every non-noise cluster has at least 1 member."""
    import os

    import duckdb

    con = duckdb.connect()
    n = con.execute(
        "SELECT COUNT(*) FROM read_parquet("
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}')"
    ).fetchone()[0]
    con.close()
    if int(sdf["n"].sum()) != n:
        return f"cluster sizes sum to {int(sdf['n'].sum())} != {n} input rows"
    if (sdf["cluster"] < -1).any():
        return "cluster id below -1"
    if (sdf["n"] <= 0).any():
        return "non-positive cluster size"
    return ""


@register("z_c2_dbscan", oracle=None,
          doc="Distributed DBSCAN: ε-pair join, core-point filter, min-label "
              "propagation components (ref mocss.py:410); numpy golden in "
              "tests/test_dbscan.py + partition contract (sizes sum to N).",
          tags=("clustering", "bench"),
          min_rows=2, columns=("cluster", "n"),
          check=_check_c2_partition)
def c2_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return (
        dbscan(e, "vec_id", "embedding", eps=1.15, min_pts=4)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


# --- C7 substitute: distributed PCA projection ------------------------------

from ae_data_integration_spark.operators.cca import covariance_cells

# Oracle for the distributed O(N) half of PCA: the covariance cells.
# The driver-side d×d eigh is golden-tested in pytest; this query puts
# the data-touching part under the value-hash gate. DuckDB assembles
# the same pairs via a keyed self-join (Spark double-posexplodes) —
# identical multiset of products, fixed-point sums commute.
_C7C_SQL = f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS v FROM embeddings),
long AS (SELECT generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM pts),
mu AS (
  SELECT i, {fpsum_sql('x', Q30)} / CAST(COUNT(*) AS DOUBLE) AS mu, COUNT(*) AS n
  FROM long GROUP BY i
),
l1 AS (SELECT id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM pts),
pairs AS (
  SELECT a.i, a.x, b.i AS j, b.x AS y FROM l1 a JOIN l1 b USING (id)
),
cross_p AS (
  SELECT i, j, {fpsum_sql('x * y', Q30)} AS cp FROM pairs GROUP BY i, j
)
SELECT c.i, c.j,
       (c.cp - (CAST(mi.n AS DOUBLE) * mi.mu * mj.mu)) / CAST(mi.n - 1 AS DOUBLE) AS cov
FROM cross_p c
JOIN mu mi ON c.i = mi.i
JOIN mu mj ON c.j = mj.i
ORDER BY c.i, c.j
"""


@register("c7_pca_covariance", oracle=_C7C_SQL,
          doc="Distributed covariance cells (i, j, cov) — the O(N) half of "
              "the C7 PCA substitute under the value-hash gate; fixed-point "
              "cross-products + means, d^2-cell shuffle only.",
          tags=("clustering", "projection"))
def c7_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return covariance_cells(e, "vec_id", "embedding")


# --- C7b: the projection itself, fully oracled ------------------------------
# eigh is not SQL-replayable, but it doesn't have to be: both engines
# derive the covariance through the SAME fixed-point aggregation
# (bit-identical — c7_pca_covariance proves it under the value hash),
# the d×d eigh runs driver-side on that identical matrix, and the
# resulting eigenvectors are embedded as ROUNDED LITERALS in both the
# Spark plan and the generated SQL. The projection arithmetic
# (identical left-fold order over identical literals) is then
# bit-exact cross-engine, which puts the whole covariance→eigh→
# project pipeline under the value-hash gate. The oracle is a
# callable (sf_dir -> SQL) because its text depends on the data.

# Literal rounding for the embedded eigenvectors/means. The Spark fn
# and the SQL generator may run eigh in DIFFERENT processes (the
# driver builds oracle text once, runs queries elsewhere); LAPACK
# low-bit jitter across processes is ~1e-15 absolute, so a 1e-9
# rounding grid leaves a ~10^6x margin before a boundary straddle
# could desynchronize the literals. (The projection is still compared
# bit-exactly — both engines use the SAME rounded literals; rounding
# only trades a ~1e-7 deviation from the unrounded PCA, irrelevant to
# the cross-engine gate.)
_C7_DECIMALS = 9
_C7_NCOMP = 2


def _c7_mu_sql(from_clause: str) -> str:
    return f"""WITH pts AS (SELECT {_V} AS v FROM {from_clause}),
long AS (SELECT generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM pts)
SELECT i, {fpsum_sql('x', Q30)} / CAST(COUNT(*) AS DOUBLE) AS mu
FROM long GROUP BY i ORDER BY i"""


def _c7b_oracle(sf_dir: str) -> str:
    """Literal-projection SQL: DuckDB recomputes the fixed-point
    covariance + means from the parquet, eigh + sign + rounding go
    through the shared pca_literals, and the projection is emitted as
    straight-line arithmetic (the exact left-fold order the Spark
    plan uses)."""
    import os

    import duckdb
    import numpy as np

    from ae_data_integration_spark.operators.cca import pca_literals

    path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    src = f"read_parquet('{path}')"
    cells = con.execute(
        _C7C_SQL.replace("FROM embeddings", f"FROM {src}")
    ).fetchall()
    mu_rows = con.execute(_c7_mu_sql(src)).fetchall()
    con.close()
    d = max(c[0] for c in cells) + 1
    cov = np.zeros((d, d))
    for i, j, v in cells:
        cov[int(i), int(j)] = v
    mu = np.round(np.array([m for _, m in sorted(mu_rows)]), _C7_DECIMALS)
    comps = pca_literals(cov, _C7_NCOMP, _C7_DECIMALS)
    proj = ",\n       ".join(
        "0.0"
        + "".join(
            f" + ((v[{i + 1}] - {float(mu[i])!r}) * {float(comps[i, j])!r})"
            for i in range(d)
        )
        + f" AS pc{j + 1}"
        for j in range(_C7_NCOMP)
    )
    return f"""WITH pts AS (SELECT vec_id AS id, {_V} AS v FROM embeddings)
SELECT id,
       {proj}
FROM pts"""


@register("c7b_pca_projection", oracle=_c7b_oracle,
          doc="2-d PCA projection (C7 substitute — the reference's t-SNE is "
              "plot-only, mocss.py TSNE scatter): distributed fixed-point "
              "covariance (the c7_pca_covariance pipeline), driver d x d "
              "eigh, projection applied as a broadcast literal matrix; "
              "FULLY oracled — the SQL twin recomputes the identical "
              "covariance, runs the identical eigh+rounding, and replays "
              "the projection arithmetic bit-exactly.",
          tags=("clustering", "projection"))
def c7b_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from functools import reduce

    from ae_data_integration_spark.operators.cca import pca_literals

    e = table(spark, sf_dir, "embeddings")
    pts = e.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cells = covariance_cells(e, "vec_id", "embedding").collect()
    long = pts.select(F.posexplode("v").alias("i", "x"))
    mu_rows = (
        long.groupBy("i")
        .agg((fpsum("x", Q30) / F.count(F.lit(1)).cast("double")).alias("mu"))
        .collect()
    )
    d = max(c["i"] for c in cells) + 1
    cov = np.zeros((d, d))
    for c in cells:
        cov[int(c["i"]), int(c["j"])] = c["cov"]
    mu = np.round(
        np.array([m for _, m in sorted((r["i"], r["mu"]) for r in mu_rows)]),
        _C7_DECIMALS,
    )
    comps = pca_literals(cov, _C7_NCOMP, _C7_DECIMALS)
    proj = [
        reduce(
            lambda acc, i: acc
            + (F.element_at("v", i + 1) - F.lit(float(mu[i])))
            * F.lit(float(comps[i, j])),
            range(d),
            F.lit(0.0),
        ).alias(f"pc{j + 1}")
        for j in range(_C7_NCOMP)
    ]
    return pts.select("id", *proj)


# Rounds 4-5 registered the projection as z_c7_pca_projection (rows-
# only); round 6 replaced it with the fully-oracled c7b_pca_projection
# under a NEW key, which broke the frozen-rotation promise for anyone
# holding the old name. Keep both historical spellings resolving (via
# catalog.resolve()) to the current key.
ALIASES["z_c7_pca_projection"] = "c7b_pca_projection"
ALIASES["c7_pca_projection"] = "c7b_pca_projection"


# --- C2 (oracled): converged DBSCAN vs a deep-unrolled SQL fixpoint ---------
# z_c2_dbscan above is the scale path (may route eps-pairs through the
# blocked numpy kernel, numpy golden). This twin runs the SAME
# converged solver but pins portable=True so the ε predicate is the
# fold-exact expression DuckDB evaluates; the oracle replays every
# step — ε-pair join, degree count, core filter, min-label component
# fixpoint (unrolled deep enough to converge on this data), border
# attach, noise — CTE-for-CTE under the value-hash gate. Ref
# mocss.py:410 (sklearn DBSCAN(eps, min_samples) on the fused
# embedding).

from ae_data_integration_spark.catalog.cc_sql import cc_unrolled_sql as _cc_unrolled_sql

_C2_EPS, _C2_MINPTS = 1.15, 4
# Unroll depth for the ORACLE's component solve. The hop+jump pass
# guarantees only +1 reach per pass on adversarial id layouts (the
# jump shortcuts only when the current label-node itself knows a
# smaller label — no doubling guarantee; see operators/dedup.py), and
# the sf0.01 core graph is chain-like (68 edges / 69 nodes): measured
# convergence is 14 passes. 16 = measured + margin; the [SF_CORRECT]
# parity + pytest equality checks fail loudly if the data ever needs
# more. (The round-5 depth of 4 silently split 5 true components
# into 10, reporting 26 'DBSCAN' clusters instead of the true 21 —
# self-consistently wrong on both engines.)
_C2_CC_ITERS = 16

_C2_VERIFIED = f"""WITH pts AS (
  SELECT CAST(vec_id AS BIGINT) AS id, {_V} AS vec FROM embeddings
),
prs AS MATERIALIZED (
  SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
  ON a.id < b.id AND {_sqd('a.vec', 'b.vec')} <= {_C2_EPS * _C2_EPS!r}
),
nbr AS MATERIALIZED (SELECT ia, ib FROM prs UNION ALL SELECT ib AS ia, ia AS ib FROM prs),
deg AS (SELECT ia, COUNT(*) + 1 AS n FROM nbr GROUP BY ia),
core AS MATERIALIZED (SELECT ia AS id FROM deg WHERE n >= {_C2_MINPTS}),
verified AS (
  SELECT p.ia AS doc_a, p.ib AS doc_b FROM prs p
  JOIN core ca ON p.ia = ca.id
  JOIN core cb ON p.ib = cb.id
)"""

_C2_TAIL = f""",
iso AS (
  SELECT c.id, c.id AS lbl FROM core c WHERE c.id NOT IN (SELECT id FROM l{_C2_CC_ITERS})
),
core_lbl AS MATERIALIZED (SELECT id, lbl FROM l{_C2_CC_ITERS} UNION ALL SELECT id, lbl FROM iso),
border AS (
  SELECT n.ia AS id, MIN(l.lbl) AS lbl
  FROM nbr n JOIN core_lbl l ON n.ib = l.id
  WHERE n.ia NOT IN (SELECT id FROM core)
  GROUP BY n.ia
),
lab AS MATERIALIZED (SELECT * FROM core_lbl UNION ALL SELECT * FROM border),
noise AS (
  SELECT p.id, CAST(-1 AS BIGINT) AS lbl FROM pts p
  WHERE p.id NOT IN (SELECT id FROM lab)
)
SELECT lbl AS cluster, COUNT(*) AS n
FROM (SELECT * FROM lab UNION ALL SELECT * FROM noise)
GROUP BY lbl ORDER BY cluster"""

_C2F_SQL = _cc_unrolled_sql(_C2_VERIFIED, n_iters=_C2_CC_ITERS, tail=_C2_TAIL)


@register("c2_dbscan_fixpoint", oracle=_C2F_SQL,
          doc="Fully-oracled DBSCAN: the Spark side runs the production "
              "CONVERGED solver (hybrid union-find / min-label loop) over "
              "fold-exact portable eps-pairs; the DuckDB oracle replays the "
              "same semantics with the min-label fixpoint unrolled to "
              f"{_C2_CC_ITERS} passes — a depth measured to converge on "
              "this data (14 needed, sf0.01), so oracle == true DBSCAN. "
              "Core filter |N(p)| >= min_pts (self included), border attach "
              "to min core-neighbor label, noise = -1; cluster-size "
              "histogram (ref mocss.py:410).",
          tags=("clustering",), min_rows=2)
def c2_dbscan_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    lab = dbscan(
        e.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding"),
        "vec_id", "embedding",
        eps=_C2_EPS, min_pts=_C2_MINPTS, portable=True,
    )
    return (
        lab.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


# --- C7c: the t-SNE itself (plot-scale, exact, seeded) ------------------------
# Closes the "t-SNE substituted by PCA" residual: the reference's
# visualization leg (tsn_visulization.py:8-27, sklearn
# TSNE(n_components=2, init='pca')) now runs as the engine's own
# exact implementation (operators/tsne.py — van der Maaten 2008,
# PCA-initialized so the fit is bit-deterministic with NO RNG).
# Gradient descent + perplexity binary search are not SQL →
# rows-only; the contract pins row count, finite centered
# coordinates, and the plot-scale input cap; KL descent, blob
# separation, and partition-independence are golden-tested
# (tests/test_tsne.py). c7b's distributed PCA remains the
# scale-bearing projection; this row is the plot-scale endpoint the
# reference actually ships.


def _check_tsne_contract(sdf, spark, sf_dir: str) -> str:
    import numpy as np

    for col in ("tsne_1", "tsne_2"):
        v = sdf[col].to_numpy(dtype=float)
        if not np.isfinite(v).all():
            return f"{col} has non-finite values"
        if abs(float(v.mean())) > 1e-6 * max(1.0, float(np.abs(v).max())):
            return f"{col} not centered (mean={v.mean()})"
    if sdf["vec_id"].duplicated().any():
        return "duplicate keys in t-SNE output"
    return ""


@register("z_c7c_tsne_2d", oracle=None,
          doc="Exact 2-D t-SNE on a plot-scale embedding sample "
              "(perplexity 30, PCA init, 250 iters) — the reference's "
              "visualization leg run for real instead of substituted. "
              "Rows-only (gradient descent is not SQL); contract pins one "
              "row per input, finite centered coords; determinism / KL "
              "descent / separation golden-tested in tests/test_tsne.py.",
          tags=("clustering", "projection"),
          min_rows=200,
          columns=("vec_id", "tsne_1", "tsne_2"),
          check=_check_tsne_contract)
def c7c_tsne_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.tsne import tsne_2d

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return tsne_2d(e, n_iter=250)


# --- SAMP4: cluster-balanced corpus sampling --------------------------------
# The diversity-preserving companion to DSIR (samp3): where DSIR
# selects by target-likeness, cluster-balanced sampling selects an
# EQUAL quota per semantic cluster (the DCLM/SemDeDup-style topic
# balancing step) — Q centroid-nearest vectors from each Lloyd's
# cluster, so no topic dominates the curated set however skewed the
# raw corpus mixture is.
#
# Scale shape: the per-cluster top-Q is a TWO-LEVEL TOURNAMENT, not a
# window — a `PARTITION BY cluster` window funnels each cluster
# through one task (k partitions however big the corpus: the same
# cliff functions/ranks.py documents for global windows). Instead:
# per (cluster, input-partition) local top-Q via sorted-slice
# collect_list (bounded by partition size), then per-cluster top-Q
# over <= partitions x Q candidate structs (model-sized). Both
# aggregates are built-ins; the sqd ranking key is Q30-quantized so
# the DuckDB oracle — which replays the whole Lloyd's unroll
# CTE-for-CTE and ranks with a plain window — is bit-identical.

_SAMP4_Q = 20

_SAMP4_SQL = f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS vec FROM embeddings),
init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('km' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts ORDER BY md5('km' || CAST(id AS VARCHAR)), id LIMIT {_K})
),
{_assign_cte('pts', 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
{_update_cte('a2', 'c2')},
{_assign_cte('pts', 'c2', 'a3')}
SELECT id AS vec_id, cluster, sqd_q, rk FROM (
  SELECT id, cluster, CAST(round(sqd * {Q30}) AS BIGINT) AS sqd_q,
         ROW_NUMBER() OVER (
           PARTITION BY cluster
           ORDER BY CAST(round(sqd * {Q30}) AS BIGINT), id
         ) AS rk
  FROM a3
) WHERE rk <= {_SAMP4_Q}
ORDER BY cluster, rk
"""


@register("samp4_cluster_balanced", oracle=_SAMP4_SQL,
          doc="Cluster-balanced sampling: Q=20 centroid-nearest vectors "
              "per Lloyd's cluster (same md5-seeded unroll as c1, oracle "
              "replays it CTE-for-CTE). Per-cluster top-Q is a two-level "
              "tournament of sorted-slice collect_lists — no k-partition "
              "window, group state bounded by partitions x Q.",
          tags=("sampling", "clustering"))
def samp4_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    assigned = kmeans_relational(e, k=_K, n_iter=_ITER, salt="km")
    aq = assigned.select(
        "id", "cluster",
        F.round(F.col(_SQD_COL) * F.lit(Q30)).cast("long").alias("sqd_q"),
    )
    cand = F.struct(F.col("sqd_q"), F.col("id"))
    local = (
        aq.withColumn("_pid", F.spark_partition_id())
        .groupBy("cluster", "_pid")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(cand)), 1, _SAMP4_Q
            ).alias("cand")
        )
    )
    sel = local.groupBy("cluster").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("cand"))), 1, _SAMP4_Q
        ).alias("sel")
    )
    return (
        sel.select("cluster", F.posexplode("sel").alias("rk0", "s"))
        .select(
            F.col("s.id").alias("vec_id"),
            "cluster",
            F.col("s.sqd_q").alias("sqd_q"),
            (F.col("rk0") + 1).cast("long").alias("rk"),
        )
        .orderBy("cluster", "rk")
    )


# --- DQ8: selection-bias audit for cluster-balanced sampling ------------------
# The governance row for samp4 (dq7's log-odds form applied over
# CLUSTERS instead of languages): equal per-cluster quotas change the
# embedding-space composition — big topics are down-weighted, small
# ones up-weighted — and this row records by exactly how much, per
# cluster: corpus count/share vs selected count/share plus the
# add-1-smoothed log-odds bias (the per-class composition table the
# reference reads before trusting a split, AE_results.ipynb). The
# oracle replays the Lloyd's unroll and the top-Q selection
# CTE-for-CTE from samp4's proven fragments; the rollup is two
# cluster-keyed counts + two 1-row broadcasts, k rows out at any
# corpus size.

_DQ8_SQL = f"""
WITH pts AS (SELECT vec_id AS id, {_V} AS vec FROM embeddings),
init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('km' || CAST(id AS VARCHAR)), id) - 1 AS cluster,
         vec AS centroid
  FROM (SELECT * FROM pts ORDER BY md5('km' || CAST(id AS VARCHAR)), id LIMIT {_K})
),
{_assign_cte('pts', 'init', 'a1')},
{_update_cte('a1', 'c1')},
{_assign_cte('pts', 'c1', 'a2')},
{_update_cte('a2', 'c2')},
{_assign_cte('pts', 'c2', 'a3')},
sel AS (
  SELECT id, cluster FROM (
    SELECT id, cluster,
           ROW_NUMBER() OVER (
             PARTITION BY cluster
             ORDER BY CAST(round(sqd * {Q30}) AS BIGINT), id
           ) AS rk
    FROM a3
  ) WHERE rk <= {_SAMP4_Q}
),
c AS (SELECT cluster, COUNT(*) AS n_corpus FROM a3 GROUP BY cluster),
s AS (SELECT cluster, COUNT(*) AS n_sel FROM sel GROUP BY cluster),
t AS (SELECT SUM(n_corpus) AS totc, COUNT(*) AS k FROM c),
ts AS (SELECT SUM(n_sel) AS tots FROM s)
SELECT c.cluster,
       CAST(c.n_corpus AS BIGINT) AS n_corpus,
       c.n_corpus / CAST(t.totc AS DOUBLE) AS share_corpus,
       CAST(COALESCE(s.n_sel, 0) AS BIGINT) AS n_selected,
       COALESCE(s.n_sel, 0) / CAST(ts.tots AS DOUBLE) AS share_selected,
       round(ln(((COALESCE(s.n_sel, 0) + 1) / CAST(ts.tots + t.k AS DOUBLE))
                / ((c.n_corpus + 1) / CAST(t.totc + t.k AS DOUBLE))), 6)
         AS bias_log_odds
FROM c LEFT JOIN s USING (cluster) CROSS JOIN t CROSS JOIN ts
ORDER BY c.cluster
"""


@register("dq8_cluster_bias", oracle=_DQ8_SQL,
          doc="Selection-bias audit for cluster-balanced sampling: "
              "per-cluster corpus vs samp4-selected composition with "
              "add-1-smoothed log-odds bias (the dq7 form over clusters) "
              "— Lloyd's unroll + top-Q selection replayed from samp4's "
              "proven CTEs; k rows out, two 1-row broadcasts.",
          tags=("sampling", "clustering", "quality"))
def dq8_cluster_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.caching import persist_tracked

    e = table(spark, sf_dir, "embeddings")
    assigned = persist_tracked(
        kmeans_relational(e, k=_K, n_iter=_ITER, salt="km")
    )
    # samp4's two-level tournament, re-expressed over the shared
    # assignment (one Lloyd's pass feeds both the counts and the cut)
    aq = assigned.select(
        "id", "cluster",
        F.round(F.col(_SQD_COL) * F.lit(Q30)).cast("long").alias("sqd_q"),
    )
    cand = F.struct(F.col("sqd_q"), F.col("id"))
    local = (
        aq.withColumn("_pid", F.spark_partition_id())
        .groupBy("cluster", "_pid")
        .agg(F.slice(F.array_sort(F.collect_list(cand)), 1, _SAMP4_Q)
             .alias("cand"))
    )
    sel = local.groupBy("cluster").agg(
        F.size(
            F.slice(F.array_sort(F.flatten(F.collect_list("cand"))),
                    1, _SAMP4_Q)
        ).cast("long").alias("n_sel")
    )
    c = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_corpus"))
    t = c.agg(F.sum("n_corpus").alias("totc"), F.count(F.lit(1)).alias("k"))
    ts = sel.agg(F.sum("n_sel").alias("tots"))
    n_sel0 = F.coalesce(F.col("n_sel"), F.lit(0))
    return (
        c.join(sel, "cluster", "left")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(ts))
        .select(
            "cluster",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (F.col("n_corpus") / F.col("totc").cast("double"))
            .alias("share_corpus"),
            n_sel0.cast("long").alias("n_selected"),
            (n_sel0 / F.col("tots").cast("double")).alias("share_selected"),
            F.round(
                F.log(
                    ((n_sel0 + 1) / (F.col("tots") + F.col("k")).cast("double"))
                    / (
                        (F.col("n_corpus") + 1)
                        / (F.col("totc") + F.col("k")).cast("double")
                    )
                ), 6,
            ).alias("bias_log_odds"),
        )
        .orderBy("cluster")
    )
