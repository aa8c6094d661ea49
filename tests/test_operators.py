"""Unit tests for the operator library against pandas/numpy goldens."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import l2_normalize, to_double
from ae_data_integration_spark.operators.scale import minmax_scale_scalar
from ae_data_integration_spark.operators.splits import kfold, stratified_split
from ae_data_integration_spark.tables import table
from tests.conftest import SF_CORRECT


def _py_md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_stratified_split_exact_counts(spark):
    c = table(spark, SF_CORRECT, "customer")
    pdf = c.select("c_custkey", "c_mktsegment").toPandas()
    got = (
        stratified_split(c, "c_mktsegment", "c_custkey", 0.8, salt="42")
        .groupBy("c_mktsegment")
        .agg(F.sum(F.col("is_train").cast("int")).alias("n_train"))
        .toPandas()
        .set_index("c_mktsegment")["n_train"]
        .to_dict()
    )
    want = {
        seg: int(round(n * 0.8))
        for seg, n in pdf.groupby("c_mktsegment")["c_custkey"].count().items()
    }
    assert got == want


def test_stratified_split_matches_python_md5_order(spark):
    """The exact train membership equals a pandas recomputation of the
    same md5('42'||key) ordering — partition-count independence."""
    c = table(spark, SF_CORRECT, "customer").repartition(13)  # deliberately odd
    got = set(
        stratified_split(c, "c_mktsegment", "c_custkey", 0.8, salt="42")
        .filter("is_train")
        .select("c_custkey")
        .toPandas()["c_custkey"]
    )
    pdf = c.select("c_custkey", "c_mktsegment").toPandas()
    pdf["h"] = pdf["c_custkey"].map(lambda k: _py_md5("42" + str(k)))
    want = set()
    for _, g in pdf.groupby("c_mktsegment"):
        k = int(round(len(g) * 0.8))
        want |= set(g.sort_values(["h", "c_custkey"]).head(k)["c_custkey"])
    assert got == want


def test_kfold_balanced(spark):
    c = table(spark, SF_CORRECT, "customer")
    sizes = (
        kfold(c, "c_custkey", n_splits=5)
        .groupBy("fold")
        .count()
        .toPandas()["count"]
        .tolist()
    )
    assert len(sizes) == 5
    assert max(sizes) - min(sizes) <= 1


def test_minmax_matches_pandas(spark):
    c = table(spark, SF_CORRECT, "customer")
    got = (
        minmax_scale_scalar(c, "c_acctbal", by=["c_nationkey"])
        .select("c_custkey", "c_acctbal_scaled")
        .toPandas()
        .set_index("c_custkey")["c_acctbal_scaled"]
    )
    pdf = c.select("c_custkey", "c_nationkey", "c_acctbal").toPandas()
    grp = pdf.groupby("c_nationkey")["c_acctbal"]
    lo, hi = grp.transform("min"), grp.transform("max")
    want = ((pdf["c_acctbal"] - lo) / (hi - lo)).fillna(0.0)
    want.index = pdf["c_custkey"]
    pd.testing.assert_series_equal(
        got.sort_index(), want.sort_index(), check_names=False, rtol=0, atol=0
    )


def test_l2_normalize_unit_norm(spark):
    e = table(spark, SF_CORRECT, "embeddings").limit(50)
    norms = (
        e.select(
            F.sqrt(
                F.aggregate(
                    F.transform(l2_normalize(to_double("embedding")), lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("n")
        )
        .toPandas()["n"]
        .tolist()
    )
    assert all(math.isclose(n, 1.0, rel_tol=1e-12) for n in norms)


def test_embedding_near_dup_keep_first(spark):
    """D4: identical vectors land in one LSH bucket; every copy but
    the smallest id is dropped, pointing at the smallest id."""
    from ae_data_integration_spark.operators.dedup import embedding_near_dup_drops

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),   # dup of 1
        (9, [2.0, 0.0, 0.0, 0.0]),   # cosine 1.0 with 1/5 too
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal — survives
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_id"], r["dup_of"])
        for r in embedding_near_dup_drops(e, bits=4, threshold=0.99).collect()
    }
    assert got == {(5, 1), (9, 1)}


def test_word_ngrams_and_rolling_fingerprint(spark):
    """Goldens for the d5/t4 text primitives: exact ngram sets and a
    Python-recomputed rolling hash."""
    import hashlib

    from ae_data_integration_spark.functions.hashing import MINHASH_P
    from ae_data_integration_spark.functions.text import (
        ROLL_B,
        rolling_fingerprint,
        word_ngrams,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "one two"), (3, "")],
        "id long, text string",
    )
    out = {
        r["id"]: (sorted(r["ng"]), r["fp"])
        for r in df.select(
            "id", word_ngrams("text", 3).alias("ng"), rolling_fingerprint("text").alias("fp")
        ).collect()
    }
    assert out[1][0] == sorted(
        ["the cat sat", "cat sat on", "sat on the", "on the mat"]
    )
    assert out[2][0] == ["one two"]  # < n tokens -> whole sequence
    assert out[3][0] == [""]

    def py_fp(text):
        h = 0
        for t in text.lower().split():
            th = int(hashlib.md5(t.encode()).hexdigest()[:12], 16)
            h = (h * ROLL_B + th) % MINHASH_P
        return h

    assert out[1][1] == py_fp("the cat sat on the mat")
    assert out[2][1] == py_fp("one two")
    assert out[3][1] == 0
    # order sensitivity: permuted tokens -> different fingerprint
    assert py_fp("cat the sat on the mat") != out[1][1]


def test_pca_project_matches_numpy(spark):
    """Distributed PCA == numpy eigh PCA (same sign convention)."""
    import numpy as np

    from ae_data_integration_spark.operators.cca import pca_project

    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 6)) @ np.diag([5, 3, 1, 0.5, 0.2, 0.1])
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["id"]: (r["pc1"], r["pc2"])
        for r in pca_project(df, "vec_id", "embedding", 2).collect()
    }

    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / (len(x) - 1)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :2]
    for j in range(2):
        if comps[np.abs(comps[:, j]).argmax(), j] < 0:
            comps[:, j] = -comps[:, j]
    want = xc @ comps
    for i in range(len(x)):
        assert abs(got[i][0] - want[i, 0]) < 1e-6
        assert abs(got[i][1] - want[i, 1]) < 1e-6


def test_asof_join_semantics(spark):
    """Backward as-of join: equal-ts visibility (non-strict vs strict),
    no-prior nulls, and tie-breaking by seq."""
    from ae_data_integration_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 200), (1, 30, 300), (2, 40, 50)],
        "k long, lid long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 1, 100, 1.0), (1, 2, 100, 2.0), (1, 3, 250, 3.0), (3, 9, 1, 9.9)],
        "k long, rid long, ts long, v double",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, "k", "ts", ["v"], seq_col="rid").collect()
    }
    # equal-ts right rows visible non-strict; tie broken by larger seq last
    assert got[10] == 2.0
    assert got[20] == 2.0       # latest at-or-before 200 is ts=100
    assert got[30] == 3.0       # ts=250 click
    assert got[40] is None      # key 2 has no right rows
    strict = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, "k", "ts", ["v"], seq_col="rid", strict=True).collect()
    }
    assert strict[10] is None   # equal-ts excluded under strict
    assert strict[20] == 2.0


def test_silhouette_cosine_exact_matches_bruteforce(spark):
    """c5_silhouette_exact == the textbook all-pairs cosine silhouette
    (sklearn silhouette_score(metric='cosine') semantics) to 1e-9."""
    import numpy as np

    from ae_data_integration_spark.operators.kmeans import silhouette_cosine_exact

    e = table(spark, SF_CORRECT, "embeddings")
    pdf = e.select("vec_id", "label", "embedding").orderBy("vec_id").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    y = pdf["label"].to_numpy()
    V = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    D = 1.0 - V @ V.T  # all-pairs cosine distances

    svals = []
    for i in range(len(y)):
        own = y == y[i]
        n_own = own.sum()
        if n_own == 1:
            svals.append(0.0)
            continue
        a = (D[i, own].sum() - D[i, i]) / (n_own - 1)
        b = min(D[i, y == c].mean() for c in np.unique(y) if c != y[i])
        svals.append((b - a) / max(a, b))
    want = float(np.mean(svals))

    got = silhouette_cosine_exact(e, "vec_id", "label", "embedding").first()[
        "silhouette"
    ]
    assert abs(got - want) < 1e-9


def test_silhouette_exact_handles_singleton_cluster(spark):
    """A singleton cluster scores 0 (sklearn nan_to_num convention)."""
    from ae_data_integration_spark.operators.kmeans import silhouette_cosine_exact

    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.9, 0.1]),
            (3, 1, [0.0, 1.0]),
        ],
        "vec_id long, label long, embedding array<double>",
    )
    got = silhouette_cosine_exact(df).first()["silhouette"]
    # point 3 is a singleton -> s=0; points 1,2 have a tight own
    # cluster and a distant other cluster -> s near 1.
    import numpy as np

    V = np.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    D = 1 - V @ V.T
    s1 = (min(D[0, 2], 1e18) - D[0, 1]) / max(D[0, 1], D[0, 2])
    s2 = (D[1, 2] - D[1, 0]) / max(D[1, 0], D[1, 2])
    want = (s1 + s2 + 0.0) / 3
    assert abs(got - want) < 1e-9


def test_dup_clusters_match_union_find(spark):
    """d6 bounded pointer-jumping == true connected components
    (union-find) on the real candidate graph at fixture scale."""
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        dup_clusters,
        jaccard_verify,
        lsh_candidate_pairs_from_shingles,
    )

    d = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).persist()
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    verified = jaccard_verify(pairs, shs, threshold=0.5).select("doc_a", "doc_b")
    edges = [(r["doc_a"], r["doc_b"]) for r in verified.collect()]
    assert edges  # corpus has verified near-dups

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict[int, int] = {}
    for node in parent:
        want[find(node)] = want.get(find(node), 0) + 1

    got = {
        r["cluster_root"]: r["n_docs"]
        for r in dup_clusters(verified, n_iters=4).collect()
    }
    assert got == want


def test_jaccard_verify_hashed_equals_string_set(spark):
    """The hashed-set verify (r8 longs-not-strings scale fix) must
    produce the same jaccard VALUES as raw string-set jaccard on real
    shingle data — 48-bit collisions would show up here."""
    from pyspark.sql import functions as F

    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_candidate_pairs_from_shingles,
    )

    d = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True).persist()
    pairs = lsh_candidate_pairs_from_shingles(shs, num_perm=8, num_bands=2)
    hashed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify(pairs, shs).collect()
    }
    assert hashed  # non-trivial candidate set
    # reference: jaccard over the raw string shingle sets
    a = shs.select(F.col("doc").alias("doc_a"), F.col("shs").alias("sa"))
    b = shs.select(F.col("doc").alias("doc_b"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb")).cast("double") - inter
    ref = {
        (r["doc_a"], r["doc_b"]): r["j"]
        for r in pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("j"))
        .collect()
    }
    assert hashed == ref  # exact equality, not approx
    shs.unpersist()
