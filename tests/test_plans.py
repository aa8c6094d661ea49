"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast, codegen, no row-Python)
are asserted, not assumed."""

from __future__ import annotations

import pytest

from ae_data_integration_spark.catalog import load_all
from ae_data_integration_spark.plans.explain import plan_asserts
from tests.conftest import SF_CORRECT

REGISTRY = load_all()


def _df(spark, name):
    return REGISTRY[name].fn(spark, SF_CORRECT)


def test_q1_pushdown_and_pruning(spark):
    (
        plan_asserts(_df(spark, "q1_pricing_summary"))
        .has_pushed_filter("l_shipdate")
        .reads_only(
            "lineitem",
            {"l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax"},
        )
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_q3_broadcasts_customer_dim(spark):
    (
        plan_asserts(_df(spark, "q3_shipping_priority"))
        .has_pushed_filter("c_mktsegment")
        .has_broadcast_join(1)
        .no_python_row_udf()
    )


def test_q5_snowflake_all_broadcast(spark):
    # Every dim join broadcasts; the lineitem side must not shuffle
    # into a sort-merge join.
    (
        plan_asserts(_df(spark, "q5_region_volume"))
        .has_broadcast_join(2)
        .no_sort_merge_join()
        .reads_only("lineitem", {"l_suppkey", "l_extendedprice", "l_discount"})
    )


def test_prep_pipeline_broadcast_stats(spark):
    # min-max stats and the label dim attach via broadcast, never a
    # global window over the fact table.
    plan_asserts(_df(spark, "prep_pipeline")).has_broadcast_join(2).no_python_row_udf()


def test_relational_queries_stay_jvm_side(spark):
    # Every oracle-checked query must be Python-free (mapInPandas
    # queries are rows-only by design and excluded here).
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        plan_asserts(q.fn(spark, SF_CORRECT)).no_python_row_udf()


def test_s1_ann_is_broadcast_not_shuffle_join(spark):
    # Probe set broadcasts against the corpus scan (nested-loop cross
    # with broadcast side — no shuffle of the big side).
    plan_asserts(_df(spark, "s1_ann_bruteforce")).has_broadcast_exchange(1)
