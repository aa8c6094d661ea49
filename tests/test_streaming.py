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


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    """sessionize_stream over a full drain emits exactly the sessions
    the batch e2 logic finds. A far-future sentinel event per user
    forces every real session closed; sentinel sessions stay open in
    state and are never emitted."""
    from ae_data_integration_spark.streaming.events import sessionize_stream

    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts")
    ten_days_us = 10 * 24 * 3600 * 1_000_000
    # One GLOBAL sentinel timestamp: per-user sentinels would time out
    # against the global watermark for every user but the latest one.
    mx_us = ev.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"] + ten_days_us
    flush = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.timestamp_micros(F.lit(mx_us)).alias("ts"),
    )
    src = str(tmp_path / "sess_src")
    ev.unionByName(flush).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    run_available_now(sessionize_stream(stream), "t_sess", mode="append")
    got = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in spark.table("t_sess").collect()
    )

    # batch golden: lag/gap/running-sum sessionization (e2 shape)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = ev.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    flagged = base.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sess.groupBy("user_id", "sess_id")
        .agg(F.min("ts_us").alias("session_start_us"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert got == want


def test_streaming_sessionization_event_time_timeout(spark, tmp_path):
    """A session left open at the end of one micro-batch emits via
    EVENT-TIME TIMEOUT once later files advance the watermark past
    its gap — no sentinel for that user."""
    import os
    import time

    from ae_data_integration_spark.streaming.events import sessionize_stream

    t0 = 1_700_000_000_000_000  # µs
    src = tmp_path / "timeout_src"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(
            [(u, e, t) for u, e, t in rows], "user_id long, event_id long, ts_us long"
        ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # file1: user 1 has a 3-event session; user 2 one event.
    write_file("f1", [(1, 1, t0), (1, 2, t0 + 60_000_000), (1, 3, t0 + 120_000_000),
                      (2, 1, t0)])
    time.sleep(1.1)  # file-source orders by modification time
    # file2: user 2 again two hours later — advances the watermark
    # past user 1's (last + 30 min) timeout.
    write_file("f2", [(2, 2, t0 + 2 * 3600 * 1_000_000)])

    schema = "user_id long, event_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_available_now(sessionize_stream(stream), "t_sess_timeout", mode="append")
    got = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in spark.table("t_sess_timeout").collect()
    }
    # user 1's session emitted by timeout; user 2's first session
    # closed by the in-batch/cross-batch gap.
    assert (1, t0, 3) in got
    assert (2, t0, 1) in got


def test_streaming_sessionization_late_data(spark, tmp_path):
    """Genuinely late, out-of-order data across micro-batches with a
    NONZERO watermark: a late event still inside the watermark extends
    the open session backwards (start_us lowered, last_us not moved
    back); a late event beyond the watermark is dropped; both sessions
    then emit at event-time timeout."""
    import time

    from ae_data_integration_spark.streaming.events import sessionize_stream

    t0 = 1_700_000_000_000_000  # µs
    m = 60 * 1_000_000  # one minute in µs
    src = tmp_path / "late_src"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long"
        ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # f1: user 1 two events; user 2 one. Max event time = t0+10m, so
    # the watermark entering the next batch is t0-20m (30m delay).
    write_file("f1", [(1, 1, t0), (1, 2, t0 + 5 * m), (2, 1, t0 + 10 * m)])
    time.sleep(1.1)  # file source orders by modification time
    # f2: user 1 late-but-within-watermark (t0-10m >= t0-20m): must
    # JOIN the open session and lower its start. user 2 late-beyond-
    # watermark (t0-25m < t0-20m): must be DROPPED. user 3 advances
    # the watermark far past both sessions' gap timeouts.
    write_file("f2", [(1, 3, t0 - 10 * m), (2, 2, t0 - 25 * m),
                      (3, 1, t0 + 180 * m)])
    time.sleep(1.1)
    # f3: one more batch so the timeouts (evaluated against the
    # watermark advanced by f2) actually fire and emit.
    write_file("f3", [(3, 2, t0 + 181 * m)])

    schema = "user_id long, event_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_available_now(
        sessionize_stream(stream, watermark="30 minutes"),
        "t_sess_late",
        mode="append",
    )
    got = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in spark.table("t_sess_late").collect()
    }
    # user 1: 3 events, session extended backwards to the late event.
    assert (1, t0 - 10 * m, 3) in got
    # user 2: the beyond-watermark event was dropped -> 1 event, and
    # no session anchored at the dropped timestamp.
    assert (2, t0 + 10 * m, 1) in got
    assert not any(s == t0 - 25 * m for (_, s, _) in got)


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


def test_stateless_text_quality_on_stream(spark, tmp_path):
    """Stateless text-analysis expressions (t2 quality scoring) apply
    unchanged to a document stream, and a parquet file sink with
    checkpoint round-trips the results — the batch/stream operator
    surface is the same code."""
    from ae_data_integration_spark.functions.text import quality_score, token_count

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    scored = stream.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        quality_score("text").alias("q"),
    )
    out = str(tmp_path / "docs_out")
    q = (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["doc_id"]: (r["n_tok"], r["q"]) for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["n_tok"], r["q"])
        for r in docs.select(
            "doc_id",
            token_count("text").alias("n_tok"),
            quality_score("text").alias("q"),
        ).collect()
    }
    assert got == want


def test_streaming_near_dup_matches_batch_lsh(spark, tmp_path):
    """Streaming MinHash-LSH near-dup candidates == the batch band
    self-join candidates after a full drain (identical signature
    expressions -> identical buckets)."""
    from ae_data_integration_spark.operators.dedup import lsh_candidate_pairs
    from ae_data_integration_spark.streaming.dedup import near_dup_candidates_stream

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "docs_dedup_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = near_dup_candidates_stream(stream, max_bucket=10_000)
    q = (
        out.writeStream.format("memory")
        .queryName("t_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["doc_a"], r["doc_b"]) for r in spark.table("t_neardup").collect()
    }

    want = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            docs, "doc_id", "text", k=5, num_perm=8, num_bands=2
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # corpus actually has near-dups


def test_stream_stream_attribution_join_matches_batch(spark):
    """Watermarked stream-stream interval join (purchases x clicks in
    the 30 min before each purchase) emits exactly the batch join's
    pair set after an availableNow drain."""
    from ae_data_integration_spark.streaming.events import attribution_join_stream

    stream = read_events_stream(spark, SF_SMOKE)
    run_available_now(
        attribution_join_stream(stream), "t_attrib", mode="append"
    )
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.table("t_attrib").collect()
    }

    ev = table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("c_us"),
    )
    want = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_us") >= F.col("p_us") - F.lit(1800000000))
            & (F.col("c_us") <= F.col("p_us")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Restarting a checkpointed file-source query must be exactly-
    once: a restart with no new data appends nothing; newly arrived
    source files are processed exactly once on the next restart."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "src")
    first = docs.filter(F.col("doc_id") < 100)
    rest = docs.filter(F.col("doc_id") >= 100)
    first.write.mode("overwrite").parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.schema(docs.schema)
            .parquet(src)
            .select("doc_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = run_once()
    assert n1 == first.count()
    # restart, no new data: nothing re-emitted
    assert run_once() == n1
    # new files arrive; restart processes exactly the delta
    rest.write.mode("append").parquet(src)
    assert run_once() == docs.count()
    # and no doc was ever duplicated
    dups = (
        spark.read.parquet(out)
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_streaming_chunking_matches_batch(spark, tmp_path):
    """chunk_tokens (t7) is a stateless generator — the same operator
    code runs on a document stream and emits the batch chunk set."""
    from ae_data_integration_spark.operators.chunking import chunk_tokens

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    run_available_now(chunk_tokens(stream), "t_chunks", mode="append")
    got = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_hash)
        for r in spark.table("t_chunks").collect()
    }
    want = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_hash)
        for r in chunk_tokens(docs).collect()
    }
    assert got == want and len(got) > 0


def test_incremental_cms_maintenance_matches_batch(spark, tmp_path):
    """Maintain a Count-Min sketch incrementally over a stream
    (foreachBatch: per-batch partial sketch merged by cell addition —
    CMS mergeability makes the incremental state equal the one-shot
    batch sketch regardless of micro-batch boundaries)."""
    from ae_data_integration_spark.functions.sketch import cms_build

    ev = table(spark, SF_SMOKE, "events").select("user_id")
    src = str(tmp_path / "src")
    # two source files -> at least two micro-batches with maxFilesPerTrigger=1
    ev.filter(F.col("user_id") % 2 == 0).write.mode("overwrite").parquet(src)
    ev.filter(F.col("user_id") % 2 == 1).write.mode("append").parquet(src)

    state: dict = {}

    def merge_batch(batch_df, batch_id):
        for r in cms_build(batch_df, "user_id", d=4, w=64).collect():
            state[(r.r, r.b)] = state.get((r.r, r.b), 0) + r.cnt

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = {(r.r, r.b): r.cnt for r in cms_build(ev, "user_id", d=4, w=64).collect()}
    assert state == want


def test_native_session_window_matches_custom_state_and_batch(spark, tmp_path):
    """sessionize_stream_native (built-in session_window, the
    production path) emits EXACTLY the sessions the custom-state
    stream and the batch e2 logic find — including the diff == gap
    boundary, which the +1µs window length exists for. Same sentinel
    harness as the custom-state test: a far-future event per user
    closes every real session; sentinel sessions stay open and are
    never emitted in append mode."""
    from ae_data_integration_spark.streaming.events import (
        run_available_now,
        sessionize_stream_native,
    )

    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts")
    ten_days_us = 10 * 24 * 3600 * 1_000_000
    mx_us = ev.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"] + ten_days_us
    flush = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.timestamp_micros(F.lit(mx_us)).alias("ts"),
    )
    # one exact-gap pair per harness run: user A's second event lands
    # precisely 30 min after the first — must stay ONE session on
    # every path (e2 keeps diff <= gap together)
    u0 = ev.select(F.min("user_id")).first()[0]
    t0 = ev.filter(F.col("user_id") == u0).agg(
        F.min(F.unix_micros("ts"))
    ).first()[0]
    edge = spark.createDataFrame(
        [(int(u0), -2, t0 + 1_800_000_000)], "user_id long, event_id long, ts_us long"
    ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
    full = ev.unionByName(edge)
    src = str(tmp_path / "sess_native_src")
    full.unionByName(flush).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    run_available_now(sessionize_stream_native(stream), "t_sess_nat", mode="append")
    got = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in spark.table("t_sess_nat").collect()
    )

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = full.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    flagged = base.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sess.groupBy("user_id", "sess_id")
        .agg(F.min("ts_us").alias("session_start_us"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert got == want
    # the exact-gap edge event joined the session that starts at t0
    # (diff == gap keeps the session alive on every path)
    assert any(u == u0 and s == t0 and n >= 2 for u, s, n in got)


def test_rolling_dau_stream_matches_batch_e11(spark, tmp_path):
    """Chained windowed aggregations (Spark 3.5+ multiple stateful
    ops): exact 7-day rolling distinct actives, stream == batch e11
    on every window the watermark closes. A far-future sentinel event
    closes all real windows; its own windows land past max_day and
    are excluded (as batch e11's max-day cap excludes them)."""
    from ae_data_integration_spark.catalog import load_all
    from ae_data_integration_spark.streaming.events import rolling_dau_stream

    ev = table(spark, SF_SMOKE, "events").select("user_id", "ts")
    mx_us = ev.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"]
    max_day = mx_us // 86400000000
    flush = spark.createDataFrame(
        [(-1,)], "user_id long"
    ).select(
        "user_id",
        F.timestamp_micros(F.lit(mx_us + 30 * 86400000000)).alias("ts"),
    )
    src = str(tmp_path / "dau_src")
    ev.unionByName(flush).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    run_available_now(rolling_dau_stream(stream), "t_dau", mode="append")
    got = {
        r["win_day"]: r["dau_7d"]
        for r in spark.table("t_dau").collect()
        if r["win_day"] <= max_day
    }

    q = load_all()["e11_rolling_dau"]
    want = {
        r["win_day"]: r["dau_7d"] for r in q.fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_stateful_checkpoint_recovery_sessionize(spark, tmp_path):
    """Kill-and-restart recovery for the STATEFUL sessionizer: drain
    half the source, stop, restart from the checkpoint with the rest
    (sessions spanning the boundary must be stitched from recovered
    state, not restarted), and assert the union of emissions across
    both runs equals the batch e2 result exactly-once. A restart with
    no new data must emit nothing. The split is at a global event-time
    threshold so the phase-1 watermark cannot discard phase-2 rows —
    the same ordering a replayable log (Kafka offsets) gives a real
    deployment; see SCALE.md's recovery row."""
    from pyspark.sql import Window

    from ae_data_integration_spark.streaming.events import sessionize_stream

    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts")
    cut_us = ev.agg(
        F.percentile_approx(F.unix_micros("ts"), 0.5).alias("m")
    ).first()["m"]
    ten_days_us = 10 * 24 * 3600 * 1_000_000
    mx_us = ev.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"] + ten_days_us
    flush = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.timestamp_micros(F.lit(mx_us)).alias("ts"),
    )

    src = str(tmp_path / "rec_src")
    out = str(tmp_path / "rec_out")
    ckpt = str(tmp_path / "rec_ckpt")
    ev.filter(F.unix_micros("ts") < cut_us).write.mode("overwrite").parquet(src)

    def drain():
        q = (
            sessionize_stream(spark.readStream.schema(ev.schema).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = drain()          # phase 1: first half, then the query stops
    assert drain() == n1  # restart, no new data: exactly-once, no re-emission
    # phase 2: the rest + the sentinel arrive; recovered state stitches
    # sessions that were open at the cut
    ev.filter(F.unix_micros("ts") >= cut_us).unionByName(flush).write.mode(
        "append"
    ).parquet(src)
    drain()

    got = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    assert len(got) == len(set(got)), "duplicate session emissions after restart"

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = ev.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    flagged = base.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sess.groupBy("user_id", "sess_id")
        .agg(F.min("ts_us").alias("session_start_us"),
             F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert got == want


def test_rocksdb_state_store_provider_swap(spark, tmp_path):
    """SCALE.md's cluster-deltas table claims the streaming state
    shapes survive swapping the default (HDFS-backed in-memory) state
    store for RocksDB — the provider a durable 100-node deployment
    runs. Prove it: the stateful sessionizer under
    RocksDBStateStoreProvider (rocksdbjni ships with pyspark) emits
    exactly the sessions the default provider emits. The conf is
    per-query (read at stream start), so set/restore around the run."""
    from ae_data_integration_spark.streaming.events import (
        run_available_now,
        sessionize_stream,
    )

    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts")
    ten_days_us = 10 * 24 * 3600 * 1_000_000
    mx_us = ev.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"] + ten_days_us
    flush = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.timestamp_micros(F.lit(mx_us)).alias("ts"),
    )
    src = str(tmp_path / "rocks_src")
    ev.unionByName(flush).write.mode("overwrite").parquet(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get(key, None)

    def drain(tag):
        stream = spark.readStream.schema(ev.schema).parquet(src)
        run_available_now(sessionize_stream(stream), tag, mode="append")
        return sorted(
            (r["user_id"], r["session_start_us"], r["n_events"])
            for r in spark.table(tag).collect()
        )

    base = drain("t_rocks_base")
    try:
        spark.conf.set(key, rocks)
        got = drain("t_rocks_swap")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == base and len(base) > 0


def test_streaming_lm_scoring_matches_batch_t23(spark, tmp_path):
    """LM perplexity scoring on a document stream == the batch t23
    scored frame EXACTLY: the bigram model trains offline (batch),
    broadcasts into every micro-batch via stream-static joins, and
    the Q30-quantized NLL math reproduces bit-for-bit — the artifact
    serve pattern for the CCNet stage on an ingestion pipeline."""
    from ae_data_integration_spark.catalog.text_q import (
        _T23_EMIT,
        _t23_lm,
        _t23_scored,
    )
    from ae_data_integration_spark.functions.text import tokens
    from ae_data_integration_spark.streaming.scoring import lm_score_stream

    toks, vocab, bg, ctx = _t23_lm(spark, SF_SMOKE)
    # materialize the model artifact (what a deployment would load)
    bg = spark.createDataFrame(bg.collect(), bg.schema)
    ctx = spark.createDataFrame(ctx.collect(), ctx.schema)

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "lm_src")
    docs.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("doc_id", tokens("text").alias("t"))
    )
    run_available_now(
        lm_score_stream(stream, vocab, bg, ctx, _T23_EMIT), "t_lm", mode="complete"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["avg_nll"])
        for r in spark.table("t_lm").collect()
    }
    want = {
        r["doc_id"]: (r["n_tok"], r["avg_nll"])
        for r in _t23_scored(spark, SF_SMOKE).collect()
    }
    assert got == want  # bit-exact, including OOV-miss smoothing


def test_streaming_ann_ingest_matches_single_shot_append(spark, tmp_path, monkeypatch):
    """Vectors appended to a PQ index FROM A STREAM (one micro-batch
    per file via foreachBatch) produce a served top-k BIT-IDENTICAL to
    a single-shot append of the same vectors — the stream==batch
    equality extended to a persisted artifact. Also checks the codes
    union covers the corpus exactly once (epoch-tagged increments,
    no duplicates)."""
    from pyspark.sql import functions as F

    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        append_to_pq_index,
        build_pq_index,
        index_dir,
        pq_serve_topk,
    )
    from ae_data_integration_spark.streaming.ann_ingest import (
        ingest_stream_to_pq_index,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "pq", "m": 8, "k": 32, "salt": "pqs"}

    # leg 1: single-shot append
    p1 = index_dir(base, "pq", params | {"leg": "oneshot"})
    build_pq_index(base, p1, m=8, k=32, salt="pqs")
    append_to_pq_index(batch, p1, tag="all")

    # leg 2: the same batch vectors as a file stream, 1 file/trigger
    p2 = index_dir(base, "pq", params | {"leg": "stream"})
    build_pq_index(base, p2, m=8, k=32, salt="pqs")
    src = str(tmp_path / "vec_src")
    batch.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ingest_stream_to_pq_index(stream, p2, query_name="t_ann_ingest")

    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    rows = lambda p: [  # noqa: E731
        (r["q_id"], r["n_id"], r["cos"], r["rk"])
        for r in pq_serve_topk(e, q, p, m=8, k=32, refine=60, topk=10)
        .orderBy("q_id", "rk").collect()
    ]
    assert rows(p2) == rows(p1)
    assert len(_code_dirs(p2)) >= 3  # base + >=2 epoch increments
    union = spark.read.parquet(*_code_dirs(p2))
    assert union.count() == e.count()
    assert union.select("id").distinct().count() == e.count()


def test_streaming_lifecycle_matches_batch_pipe9(spark, tmp_path, monkeypatch):
    """The FULL pipe9 composition driven by a document stream (one
    micro-batch per file: dedup vs frozen corpus -> accepted/drop
    sinks -> index append under frozen codebooks) produces, after the
    post-drain manifest job, a report BIT-IDENTICAL to the single-shot
    batch pipe9 — stream==batch asserted on the end-to-end artifact,
    not a single operator."""
    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog.lifecycle_q import (
        _P9_SALT,
        lifecycle_report,
        pipe9_corpus_lifecycle,
    )
    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        build_pq_index,
        index_dir,
    )
    from ae_data_integration_spark.streaming.lifecycle import (
        ingest_stream_to_lifecycle,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))

    # leg 1: the registered single-shot batch query
    report_b = [tuple(r) for r in pipe9_corpus_lifecycle(spark, SF_SMOKE).collect()]

    # leg 2: the same batch docs as a file stream against its OWN
    # index dir (same corpus, same salt -> identical frozen codebooks)
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    base_e = e.filter(F.col("vec_id") % 5 != 0)
    p2 = index_dir(
        base_e, "pq", {"kind": "pq", "m": 8, "k": 32, "salt": _P9_SALT,
                       "train": "mod5", "leg": "stream"}
    )
    build_pq_index(base_e, p2, m=8, k=32, salt=_P9_SALT)
    src = str(tmp_path / "doc_src")
    batch.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "lifecycle_out")
    ingest_stream_to_lifecycle(
        stream, corpus, e, out, p2, query_name="t_lifecycle"
    )

    accepted_s = spark.read.parquet(f"{out}/accepted/b*")
    drops_s = spark.read.parquet(f"{out}/drops/b*")
    report_s = [
        tuple(r)
        for r in lifecycle_report(spark, SF_SMOKE, accepted_s, drops_s, p2)
        .collect()
    ]
    assert report_s == report_b

    # the streamed index serves the same vector set exactly once
    assert len(_code_dirs(p2)) >= 3  # base + >=2 epoch increments
    union = spark.read.parquet(*_code_dirs(p2))
    n_expected = base_e.count() + accepted_s.count()
    assert union.count() == n_expected
    assert union.select("id").distinct().count() == n_expected

    # drop provenance survives the stream path (signal attribution)
    sig = {r["signal"] for r in drops_s.select("signal").distinct().collect()}
    assert sig <= {"exact", "near"} and len(drops_s.collect()) > 0


def test_streaming_lifecycle_checkpoint_resume_and_replay(
    spark, tmp_path, monkeypatch
):
    """Recovery semantics for the lifecycle ingest: (1) a drain
    restarted WITH its checkpoint resumes — only new files are
    processed, epoch ids continue; (2) even a TOTAL checkpoint loss
    followed by a full-source replay cannot duplicate — every
    per-epoch artifact (accepted/drops parquet, codes increment) is a
    deterministic per-tag overwrite, so the post-replay unions are
    row-identical. Both end states must match the single-shot batch
    dedup."""
    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog.lifecycle_q import (
        _P9_SALT,
        _p9_dedup,
    )
    from ae_data_integration_spark.operators.ann_index import (
        _code_dirs,
        build_pq_index,
        index_dir,
    )
    from ae_data_integration_spark.streaming.lifecycle import (
        ingest_stream_to_lifecycle,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    base_e = e.filter(F.col("vec_id") % 5 != 0)
    p = index_dir(base_e, "pq", {"salt": _P9_SALT, "leg": "recovery"})
    build_pq_index(base_e, p, m=8, k=32, salt=_P9_SALT)

    src = str(tmp_path / "doc_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # first half of the batch arrives
    batch.filter(F.col("doc_id") < 250).repartition(2).write.mode(
        "overwrite"
    ).parquet(src)

    def drain(checkpoint):
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ingest_stream_to_lifecycle(
            stream, corpus, e, out, p,
            query_name="t_lc_recov", checkpoint_dir=checkpoint,
        )

    drain(ckpt)
    import glob as _glob

    n_epochs_1 = len(_glob.glob(f"{out}/accepted/b*"))
    # "crash" between arrivals; the second half lands as NEW files
    for i, chunk in enumerate(
        batch.filter(F.col("doc_id") >= 250).repartition(2)
        .randomSplit([0.5, 0.5], seed=1)
    ):
        chunk.write.mode("append").parquet(src)
    drain(ckpt)  # resume from checkpoint: processes only the new files
    n_epochs_2 = len(_glob.glob(f"{out}/accepted/b*"))
    assert n_epochs_2 > n_epochs_1  # new epochs appended, old untouched

    def state():
        acc = spark.read.parquet(f"{out}/accepted/b*")
        ids = sorted(r["doc_id"] for r in acc.select("doc_id").collect())
        union = spark.read.parquet(*_code_dirs(p))
        codes = sorted(
            (r["id"], tuple(r["codes"])) for r in union.collect()
        )
        return ids, codes

    ids_resume, codes_resume = state()
    assert len(ids_resume) == len(set(ids_resume))  # no duplicates

    # total checkpoint loss: full replay over the same source
    drain(str(tmp_path / "ckpt_fresh"))
    ids_replay, codes_replay = state()
    assert ids_replay == ids_resume
    assert codes_replay == codes_resume

    # both end states equal the single-shot batch dedup's accepted set
    _, _, _, accepted = _p9_dedup(spark, SF_SMOKE)
    want = sorted(r["doc_id"] for r in accepted.select("doc_id").collect())
    assert ids_resume == want


def test_streaming_dsir_selection_matches_batch_samp3(spark, tmp_path):
    """Gumbel top-k is a mergeable sketch: draining the documents as
    a stream of micro-batches against the frozen lr model must
    reproduce the batch samp3 selection bit-for-bit, and a full
    replay over the same source (simulating checkpoint loss) must be
    a no-op because per-doc keys are deterministic."""
    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog import load_all
    from ae_data_integration_spark.operators.selection import dsir_lr_table
    from ae_data_integration_spark.streaming.selection import (
        dsir_select_stream,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # the offline artifact: fit on the full corpus, materialized so
    # micro-batches don't re-run the corpus aggregation per epoch
    lr_df = dsir_lr_table(d, target_lang="en")
    lr = spark.createDataFrame(lr_df.collect(), lr_df.schema)

    src = str(tmp_path / "src")
    d.repartition(4).write.parquet(src)
    state = str(tmp_path / "state")

    def drain():
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        dsir_select_stream(stream, lr, state, query_name="t_dsir_stream")

    drain()
    got1 = sorted(
        tuple(r) for r in spark.read.parquet(state).collect()
    )
    want = sorted(
        tuple(r)
        for r in load_all()["samp3_dsir_select"].fn(spark, SF_SMOKE).collect()
    )
    assert got1 == want and len(want) == 50

    drain()  # full replay, no checkpoint: must converge to the same state
    got2 = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert got2 == got1
