"""Sketch guarantees vs exact answers (CMS one-sided error, HLL rsd
bound, GK quantile rank error)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ae_data_integration_spark.functions.sketch import (
    approx_quantiles,
    cms_build,
    cms_estimate,
    hll_distinct,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE

_D, _W = 4, 64


def test_cms_never_undercounts_and_bounded(spark):
    ev = table(spark, SF_SMOKE, "events").select("user_id")
    n_total = ev.count()
    sketch = cms_build(ev, "user_id", d=_D, w=_W)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(sketch, exact, "user_id", d=_D, w=_W).collect()
    assert len(est) == exact.count()
    for r in est:
        assert r.cms_n >= r.exact_n, f"CMS undercounted {r}"
        # classic CMS additive bound, generous slack: e*N/w per row min'd over d
        assert r.cms_n - r.exact_n <= 4 * n_total / _W


def test_cms_is_partition_independent(spark):
    ev = table(spark, SF_SMOKE, "events").select("user_id")
    a = {(r.r, r.b): r.cnt for r in cms_build(ev, "user_id", d=_D, w=_W).collect()}
    b = {
        (r.r, r.b): r.cnt
        for r in cms_build(ev.repartition(13), "user_id", d=_D, w=_W).collect()
    }
    assert a == b


def test_hll_within_rsd(spark):
    ev = table(spark, SF_SMOKE, "events")
    exact = ev.select("user_id").distinct().count()
    got = ev.agg(hll_distinct(ev, "user_id", rsd=0.02).alias("n")).first()["n"]
    assert abs(got - exact) <= max(3, 5 * 0.02 * exact)


def test_approx_quantiles_rank_error(spark):
    ev = table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    n = ev.count()
    got = approx_quantiles(ev, "value", [0.5], relative_error=0.01)[0]
    rank = ev.filter(F.col("value") <= got).count()
    assert abs(rank - 0.5 * n) <= 0.011 * n + 1


def test_cms_is_mergeable(spark):
    """CMS cells add: sketch(A ∪ B) == cellwise sum of sketch(A) and
    sketch(B) — the property that makes the sketch shuffle-light
    (map-side partials ARE per-partition sketches)."""
    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_id")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    full = {
        (r.r, r.b): r.cnt for r in cms_build(ev, "user_id", d=_D, w=_W).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms_build(part, "user_id", d=_D, w=_W).collect():
            merged[(r.r, r.b)] = merged.get((r.r, r.b), 0) + r.cnt
    assert merged == full


def test_kmv_estimate_reasonable_and_deterministic(spark):
    from ae_data_integration_spark.functions.sketch import kmv_distinct

    ev = table(spark, SF_SMOKE, "events")
    rows = kmv_distinct(ev, "user_id", "event_type", k=32).collect()
    assert len(rows) > 0
    for r in rows:
        if r.n_exact < 32:
            assert r.kmv_est == float(r.n_exact)
        else:
            # KMV rel. error ~ 1/sqrt(k-2); allow 4 sigma
            assert abs(r.kmv_est - r.n_exact) <= 4 * r.n_exact / (30 ** 0.5)
    again = kmv_distinct(ev.repartition(11), "user_id", "event_type", k=32).collect()
    assert sorted((r.event_type, r.n_exact, r.kmv_est) for r in again) == sorted(
        (r.event_type, r.n_exact, r.kmv_est) for r in rows
    )


def test_c4b_exact_assignment_matches_hungarian(spark):
    """The 120-injection relational optimum (c4b) equals the scipy
    Hungarian optimum on the same contingency matrix."""
    from ae_data_integration_spark.catalog import load_all
    from ae_data_integration_spark.functions.hashing import md5_bucket
    from ae_data_integration_spark.operators.metrics import munkres_accuracy

    reg = load_all()
    got = reg["c4b_matched_exact"].fn(spark, SF_SMOKE).first()
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    p = e.select(
        "label", md5_bucket("vec_id", 4, salt="alt4").cast("int").alias("pred")
    )
    want = munkres_accuracy(p, "label", "pred").first()["munkres_accuracy"]
    assert abs(got["matched_accuracy"] - want) < 1e-12
