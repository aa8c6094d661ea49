"""Scale patterns: salting equivalence and bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import Q20, fpsum
from ae_data_integration_spark.functions.skew import salted_fpsum, salted_join
from ae_data_integration_spark.plans.explain import formatted_plan
from ae_data_integration_spark.tables import table
from tests.conftest import SF_CORRECT


def test_salted_sum_equals_plain(spark):
    o = table(spark, SF_CORRECT, "orders")
    plain = (
        o.groupBy("o_orderpriority")
        .agg(fpsum("o_totalprice", Q20).alias("total"))
        .toPandas()
        .set_index("o_orderpriority")["total"]
        .to_dict()
    )
    salted = (
        salted_fpsum(o, "o_orderpriority", "o_totalprice", Q20, "o_orderkey", 16)
        .toPandas()
        .set_index("o_orderpriority")["total"]
        .to_dict()
    )
    assert salted == plain  # fixed-point sums commute exactly


def test_salted_join_equals_plain(spark):
    o = table(spark, SF_CORRECT, "orders")
    c = table(spark, SF_CORRECT, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey", "o_orderkey", 8).count()
    assert salted == plain


def test_bucketed_join_is_shuffle_free(spark):
    """Bucketing both sides on the join key pre-partitions the data so
    the sort-merge join needs NO Exchange — the co-located-join pattern
    for repeated fact-fact joins at scale. (warehouse.dir is a static
    conf; tables land in ./spark-warehouse, dropped afterwards.)"""
    o = table(spark, SF_CORRECT, "orders")
    li = table(spark, SF_CORRECT, "lineitem")
    # overwrite mode still trips on a stale orphaned location — clear.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    import shutil
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    # At fixture scale Catalyst would broadcast the small side and hide
    # the effect under test — force the sort-merge path.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderpriority").count()
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # The join inputs must come straight from the bucketed scans — no
    # shuffle exchange below the join.
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").count().orderBy("o_orderpriority").collect()
    )
    got = joined.orderBy("o_orderpriority").collect()
    assert got == want
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salting_bounds_the_straggler_partition(spark):
    """The distribution fact behind skew.py: a key holding 50% of all
    rows funnels >= 50% of the shuffle into ONE task; salting the row
    key 16 ways bounds the largest partition near the uniform share.
    Deterministic (md5 salts, fixed partition count) — this is the
    straggler-ratio assertion for the zipf study in
    scripts/measure_skew.py."""
    from ae_data_integration_spark.functions.skew import with_salt

    n, p = 20_000, 16
    df = spark.range(n).select(
        F.when(F.col("id") < n // 2, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("row_key"),
    )

    def max_share(frame, *cols):
        sizes = (
            frame.repartition(p, *[F.col(c) for c in cols])
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in sizes) / n

    assert max_share(df, "k") >= 0.5  # the hot key IS one task
    # n_salts must be MUCH larger than the partition count: with
    # n_salts == p the hot key becomes p salt-buckets hashed into p
    # partitions, and balls-into-bins collisions still leave a ~2.5x
    # straggler (measured 0.154 share here). 16x over-salting smooths
    # the hot key to near-uniform load — the rule skew.py callers
    # should size by (n_salts >= 16 * parallelism for hot keys).
    salted = with_salt(df, "row_key", n_salts=16 * p)
    share = max_share(salted, "k", "_salt")
    assert share < 2.0 / p, f"salted straggler share {share} >= 2x uniform"


def test_shingle_explode_plan_has_no_reinlined_generate_filter(spark):
    """The dedup-family skew lesson (SCALE_SPOT_r12 doc_skew study):
    InferFiltersFromGenerate used to synthesize `size(shs) > 0` under
    the shingle explode, and predicate pushdown re-inlined the whole
    char-array expression into a per-scan-row filter — split(text)
    re-evaluated per lambda element, an O(len^2) pass that blew up
    13.7x on a zipf doc-length corpus. The rule is excluded in
    session.py; this pins BOTH halves of the fix in the optimized
    plan: split() appears exactly once (the char_array projection is
    a real boundary, not collapsed into the lambdas), and no
    size(...)>0 filter was inferred below the explode."""
    from pyspark.sql import functions as F

    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        lsh_band_table,
    )

    d = spark.createDataFrame(
        [(i, "the quick brown fox %d jumps over the lazy dog" % i)
         for i in range(50)],
        "doc_id long, text string",
    )
    bt = lsh_band_table(doc_shingles(d, "doc_id", "text", k=5), 16, 2)
    plan = bt._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan
    assert "Filter (size(" not in plan, plan
