"""Streaming twins equal their batch queries after full drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import Q20, fpsum

from ae_data_integration_spark.streaming.events import (
    hourly_rollup,
    read_events_stream,
    run_available_now,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE


def test_streaming_hourly_rollup_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    run_available_now(hourly_rollup(stream), "t_hourly", mode="complete")
    got = (
        spark.table("t_hourly")
        .orderBy("hour_epoch", "event_type")
        .toPandas()
    )

    ev = table(spark, SF_SMOKE, "events")
    want = (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fpsum("value", Q20).alias("total_value"),
        )
        .orderBy("hour_epoch", "event_type")
        .toPandas()
    )
    assert got.equals(want)


def test_stream_static_broadcast_join(spark):
    """Stream-static join: enrich the event stream with a static
    dimension; result equals the batch join."""
    dim = spark.createDataFrame(
        [(i, f"cohort{i % 3}") for i in range(200)], "user_id long, cohort string"
    )
    stream = read_events_stream(spark, SF_SMOKE)
    enriched = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    run_available_now(enriched, "t_enriched", mode="complete")
    got = spark.table("t_enriched").orderBy("cohort").toPandas()

    want = (
        table(spark, SF_SMOKE, "events")
        .join(F.broadcast(dim), "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cohort")
        .toPandas()
    )
    assert got.equals(want)


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState accumulates per-user state across
    MULTIPLE micro-batches (3 input files, maxFilesPerTrigger=1);
    the final per-user count equals the batch groupBy."""
    from ae_data_integration_spark.streaming.stateful import running_user_counts

    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_id")
    src = str(tmp_path / "ev_parts")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_user_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"))
        .orderBy("user_id")
        .toPandas()
    )
    want = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).orderBy("user_id").toPandas()
    )
    assert got.equals(want)
    # multiple batches actually ran (update mode emits per batch)
    assert spark.table("t_state").count() > want.shape[0]


def test_streaming_dedup_matches_batch_distinct(spark):
    from ae_data_integration_spark.streaming.events import dedup_keys_stream

    stream = read_events_stream(spark, SF_SMOKE)
    run_available_now(
        dedup_keys_stream(stream), "t_dedup", mode="append"
    )
    got = sorted(
        (r["user_id"], r["event_type"]) for r in spark.table("t_dedup").collect()
    )
    ev = table(spark, SF_SMOKE, "events")
    want = sorted(
        (r["user_id"], r["event_type"])
        for r in ev.select("user_id", "event_type").distinct().collect()
    )
    assert got == want
