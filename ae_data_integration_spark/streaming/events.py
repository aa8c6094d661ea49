"""Structured Streaming operators over the events stream.

The reference has no streaming layer (SURVEY §2.10); this is the
engine's forward extension. Each transformation here is the exact
streaming twin of a batch query in catalog/events_q.py — same
expressions, so after all windows close (availableNow drain or
watermark expiry) the streaming state equals the batch result, which
is how tests/test_streaming.py verifies it.

Scale notes: the hourly rollup keys state by (window, event_type) —
bounded by cardinality × watermark horizon; the per-user session agg
uses applyInPandasWithState-free sessionization only in batch (true
streaming sessionization would key state by user_id with a 30-min
timeout; left for the next round)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ae_data_integration_spark.functions.portable import Q20, fpsum

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet.

    Uses the batch reader's schema (nanos→micros conversion included)
    so stream and batch plans see identical columns.
    """
    import os

    

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # File-stream sources require a directory basePath; select the
    # events file out of the shared sf_dir with a glob filter.
    reader = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def hourly_rollup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of e1_hourly_rollup (same aggregate expressions).

    Watermark bounds state: windows older than max(event time) −
    watermark are finalized and dropped. countDistinct is replaced by
    approx_count_distinct in streaming mode (exact distinct needs
    unbounded state); the batch twin keeps the exact count, so the
    comparison column set excludes it.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fpsum("value", Q20).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(sdf: DataFrame, query_name: str, mode: str = "complete"):
    """Drain the whole source with availableNow into a memory sink;
    returns the finished StreamingQuery (results via
    spark.table(query_name))."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_keys_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming key dedup: first arrival wins; duplicate keys inside
    the watermark horizon are dropped and per-key state expires with
    the watermark (dropDuplicatesWithinWatermark), so state is
    bounded by key cardinality × horizon — the streaming twin of
    batch `select(keys).distinct()` once the source drains.
    """
    return (
        events.select("ts", *keys)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )
