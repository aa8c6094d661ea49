"""Structured Streaming operators over the events stream.

The reference has no streaming layer (SURVEY §2.10); this is the
engine's forward extension. Each transformation here is the exact
streaming twin of a batch query in catalog/events_q.py — same
expressions, so after all windows close (availableNow drain or
watermark expiry) the streaming state equals the batch result, which
is how tests/test_streaming.py verifies it.

Scale notes: the hourly rollup keys state by (window, event_type) —
bounded by cardinality × watermark horizon; sessionize_stream keys
state by user_id (one open session per user — three longs) with an
event-time timeout, so state is bounded by active-user cardinality,
not event volume."""

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
    # Same ts normalization as tables.table so stream and batch plans
    # see identical columns under every testdata layout.
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                )
            ),
        )
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


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """True streaming sessionization — the streaming twin of
    e2_sessionize (catalog/events_q.py): per-user sessions split on a
    30-min inactivity gap, emitted as (user_id, session_start_us,
    n_events) rows the moment each session CLOSES.

    Mechanics: ``applyInPandasWithState`` keyed by user_id holds one
    open session (start_us, last_us, n — three longs, so state is
    bounded by active users, not events). Within a micro-batch,
    sorted events extend or split the open session; sessions closed
    by an in-batch gap emit immediately. The open session registers
    an event-time timeout at last_us + gap: when the watermark passes
    it, the timed-out invocation emits the session and clears the
    state — late data beyond the watermark can no longer reopen it,
    which is exactly the correctness contract watermarks buy.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StructType

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = StructType.fromDDL(
        "user_id long, session_start_us long, n_events long"
    )
    state_schema = StructType.fromDDL("start_us long, last_us long, n long")

    def fn(key, pdfs, state: GroupState):
        user_id = int(key[0])
        if state.hasTimedOut:
            start_us, _last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_us": [start_us], "n_events": [n]}
            )
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(["ts", "event_id"])
        # Normalize to ns explicitly: under Arrow/pandas-2.x conversion
        # the column can arrive as datetime64[us], where a bare
        # astype('int64') // 1000 would yield ms, not us.
        ts_us = (batch["ts"].astype("datetime64[ns]").astype("int64") // 1000).tolist()
        # Spark does NOT auto-filter late rows for arbitrary stateful
        # ops (the watermark only drives timeouts) — enforce the
        # late-data contract here: events older than the current
        # watermark cannot extend or reopen a session.
        wm_us = state.getCurrentWatermarkMs() * 1000
        ts_us = [t for t in ts_us if t >= wm_us]
        if not ts_us:
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = None
            last_us = n = 0
        closed: list[tuple[int, int]] = []
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((start_us, n))
                start_us, last_us, n = t, t, 1
            else:
                # Late-but-within-watermark events from an earlier
                # micro-batch can arrive with t < last_us (or even
                # t < start_us): extend the session in BOTH directions
                # instead of moving last_us backwards.
                last_us = max(last_us, t)
                start_us = min(start_us, t)
                n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [s for s, _ in closed],
                    "n_events": [c for _, c in closed],
                }
            )

    return (
        events.select("user_id", "event_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_stream_native(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Sessionization via the BUILT-IN session window — the production
    path at scale. Identical output contract to ``sessionize_stream``
    (user_id, session_start_us, n_events emitted when the watermark
    closes each session), but the merge/split, state, and emission all
    run inside the JVM's streaming session-window aggregation: no
    per-group Python invocation, no Arrow transfer, state in the
    state store as a native aggregate.

    This exists because the measured wall on the custom-state path is
    NOT the engine: applyInPandasWithState costs one Python call +
    Arrow round-trip per (user, micro-batch) (~0.4 ms), which caps a
    10k-user replay at ~25k rows/s regardless of data size. The
    native window removes exactly that term; ``sessionize_stream``
    remains the harness for session logic a built-in aggregate cannot
    express (per-event custom emission, cross-field state machines).

    Boundary parity: session_window(gap) merges events with
    diff < gap, while e2/sessionize_stream keep a session alive on
    diff <= gap — so the window length is gap + 1 µs, making the two
    paths EQUAL on every input (asserted stream==batch in
    tests/test_streaming.py).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_us + 1} microseconds"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


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


def attribution_join_stream(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: purchases x clicks on
    user_id where the click falls in the ``horizon`` before the
    purchase — the streaming twin of catalog e5_attribution_window
    (per-pair rows; the per-purchase aggregate is downstream).

    State bound: both sides buffer only rows newer than
    (watermark + horizon) — the range condition lets Spark evict
    clicks older than any joinable purchase, so state is event-rate x
    horizon, not the full history. Split from one events stream so a
    single file source feeds both sides.
    """
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            "value",
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - INTERVAL {horizon}"
            " AND c_ts <= p_ts"
        ),
    ).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id", "value",
    )


def rolling_dau_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of e11_rolling_dau: EXACT 7-day rolling distinct
    actives with bounded state — the aggregate hourly_rollup had to
    approximate (exact countDistinct inside one streaming agg needs
    unbounded per-group user sets).

    The move is chained time-window aggregations (legal in append
    mode since Spark 3.5): stage 1 groups by (sliding 7d/1d window,
    user_id) — state is one counter per active (window, user), evicted
    when the watermark passes the window — and stage 2 counts the rows
    stage 1 EMITS per closed window, which is exactly the distinct
    user count. No user-set state ever accumulates; both stages are
    JVM-side windowed aggs.

    Output: (win_day, dau_7d) where win_day is the LAST activity day
    the window covers (batch e11's labeling: window day d counts
    users active in [d-6, d]). Only watermark-closed windows emit.
    """
    per_user = (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "7 days", "1 day").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_user.groupBy("w")
        .agg(F.count(F.lit(1)).alias("dau_7d"))
        .select(
            (
                F.unix_micros(F.col("w.end")).cast("long")
                / F.lit(86400000000).cast("long")
            ).cast("long").alias("day_after"),
            "dau_7d",
        )
        .select((F.col("day_after") - 1).alias("win_day"), "dau_7d")
    )
