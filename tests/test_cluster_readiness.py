"""Cluster-readiness: the local[32] session pins scale-oriented
defaults (session.py); a real cluster changes them. These tests pin
the two properties that must survive those changes (VERDICT r8 #7):

1. Plans whose tests assert broadcast joins must DEGRADE SAFELY when
   the dimension outgrows `spark.sql.autoBroadcastJoinThreshold`
   (modeled as -1, auto-broadcast fully off): equi-joins fall back to
   sort-merge/shuffled-hash — never a CartesianProduct. Joins built
   on an explicit F.broadcast() hint keep broadcasting by design:
   every such side in the catalog is bounded by CONSTRUCTION (one-row
   aggregates, k x d centroids, probe sets), not by a config
   threshold, so the hint stays correct on any cluster.

2. Results are bit-identical with auto-broadcast off — join strategy
   is a physical concern only.

The full cluster-deltas table (what else a 100-node run changes and
why) lives in SCALE.md §"Cluster deltas".
"""

from __future__ import annotations

import pytest

from ae_data_integration_spark.catalog import load_all, resolve
from ae_data_integration_spark.oracle import compare_frames
from ae_data_integration_spark.plans.explain import plan_asserts
from tests.conftest import SF_CORRECT, SF_SMOKE

REGISTRY = load_all()

# Queries whose plan tests assert broadcast behavior somewhere
# (tests/test_plans.py): the degradation set.
_BROADCAST_ASSERTED = (
    "q3_shipping_priority",      # auto-broadcast customer dim
    "q5_region_volume",          # snowflake: every dim auto-broadcasts
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "prep_pipeline",             # broadcast stats joins
    "l2_batchnorm",              # broadcast per-dim stats
    "scd2_merge_upsert",         # full-outer key join
    "scd3_point_in_time",        # key-local range join
    "q15_top_supplier",
)


@pytest.fixture()
def no_auto_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield spark
    finally:
        spark.conf.set(key, old)


def test_broadcast_asserted_plans_degrade_without_cartesian(no_auto_broadcast):
    spark = no_auto_broadcast
    for name in _BROADCAST_ASSERTED:
        df = REGISTRY[resolve(name)].fn(spark, SF_CORRECT)
        pa = plan_asserts(df)
        assert "CartesianProduct" not in pa.plan, (
            f"{name} degenerates to a cartesian without auto-broadcast:\n"
            f"{pa.plan}"
        )
        # the star/snowflake equi-joins must actually fall back to a
        # shuffle join (not silently keep broadcasting a dim whose
        # size estimate a cluster would reject)
        if name in ("q3_shipping_priority", "q5_region_volume",
                    "q7_volume_shipping", "q9_product_profit"):
            assert ("SortMergeJoin" in pa.plan
                    or "ShuffledHashJoin" in pa.plan), (
                f"{name}: no shuffle-join fallback in plan:\n{pa.plan}"
            )


def test_results_identical_without_auto_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    names = ("q5_region_volume", "l2_batchnorm", "scd3_point_in_time")
    baseline = {
        n: REGISTRY[resolve(n)].fn(spark, SF_SMOKE).toPandas() for n in names
    }
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        for n in names:
            got = REGISTRY[resolve(n)].fn(spark, SF_SMOKE).toPandas()
            diff = compare_frames(got, baseline[n])
            assert diff == "", f"{n} differs without auto-broadcast: {diff}"
    finally:
        spark.conf.set(key, old)
