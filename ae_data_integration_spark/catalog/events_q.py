"""Event-stream queries (batch twins of the streaming layer).

The reference has no streaming surface (SURVEY §2.10); these are the
engine's forward-looking operators over the driver's `events` table.
Each query here is the *batch-mode twin* of a Structured Streaming
plan in streaming/events.py — identical transformations, so the
batch result is the streaming result after watermark close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.portable import Q20, fpsum
from ae_data_integration_spark.tables import table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# --- E1: hourly tumbling-window rollup --------------------------------------

_E1_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       COUNT(*) AS n_events,
       (SUM(CAST(round(value * 1048576) AS BIGINT)) / 1048576.0) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY hour_epoch, event_type
ORDER BY hour_epoch, event_type
"""


@register("y_e1_hourly_rollup", oracle=_E1_SQL,
          doc="Tumbling 1h window agg — batch twin of the streaming rollup.",
          tags=("events", "bench"))
def e1_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # Hour bucket via pure integer arithmetic on epoch micros —
    # date_trunc on a timestamp is session-timezone-sensitive and the
    # driver's session TZ is not ours to control.
    hour_epoch = F.expr("unix_micros(ts) div 3600000000") * F.lit(3600).cast("long")
    return (
        ev.groupBy(
            hour_epoch.alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fpsum("value", Q20).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour_epoch", "event_type")
    )


# --- E2: sessionization (30-min inactivity gap) -----------------------------

_E2_SQL = """
WITH x AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM x
),
sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
),
per_sess AS (SELECT user_id, sess_id, COUNT(*) AS n FROM sess GROUP BY user_id, sess_id)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       MAX(n) AS max_session_events
FROM per_sess
GROUP BY user_id
ORDER BY user_id
"""


@register("y_e2_sessionize", oracle=_E2_SQL,
          doc="Gap-based sessionization via lag + running sum windows; exact "
              "microsecond arithmetic.",
          tags=("events", "window", "bench"))
def e2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w_order).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w_order)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sess_id", F.sum("new_s").over(w_run))
    per_sess = sess.groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# --- E3: per-cohort event-type pivot ----------------------------------------

_E3_SQL = """
SELECT user_id % 10 AS cohort,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY cohort
ORDER BY cohort
"""


@register("y_e3_type_pivot", oracle=_E3_SQL,
          doc="groupBy().pivot() with explicit value list (deterministic schema).",
          tags=("events", "pivot"))
def e3_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("cohort")
    )


# --- E4: as-of join (purchases enriched with latest prior click) ------------

_E4_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value FROM events
),
u AS (
  SELECT user_id, event_id, ts_us, 1 AS side, event_id AS seq,
         NULL::DOUBLE AS cv, NULL::DOUBLE AS cts
  FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, NULL::BIGINT, ts_us, 0, event_id, value, CAST(ts_us AS DOUBLE)
  FROM ev WHERE event_type = 'click'
),
x AS (
  SELECT user_id, event_id, ts_us, side,
         last_value(cv IGNORE NULLS) OVER w AS click_value,
         last_value(cts IGNORE NULLS) OVER w AS click_ts_us
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts_us, click_value, click_ts_us
FROM x WHERE side = 1
ORDER BY user_id, ts_us, event_id
"""


@register("e4_asof_prior_click", oracle=_E4_SQL,
          doc="As-of (backward) join: each purchase takes the latest "
              "click at-or-before it per user, via the union + "
              "last(IGNORE NULLS) window form (operators/asof.py) — one "
              "key shuffle, no range-join explosion.",
          tags=("events", "asof", "bench"))
def e4_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"),
        "event_type", "value",
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "event_id",
        F.col("value").alias("click_value"),
        F.col("ts_us").cast("double").alias("click_ts_us"),
    )
    out = asof_join(
        left, right, "user_id", "ts_us",
        ["click_value", "click_ts_us"], seq_col="event_id",
    )
    return out.select(
        "user_id", "event_id", "ts_us",
        F.col("asof_click_value").alias("click_value"),
        F.col("asof_click_ts_us").alias("click_ts_us"),
    ).orderBy("user_id", "ts_us", "event_id")


# --- E5: attribution window join (batch twin of the stream-stream join) -----

_E5_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS c_us, value FROM events
  WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_id,
       COUNT(*) AS n_clicks,
       (SUM(CAST(round(c.value * 1048576) AS BIGINT)) / 1048576.0) AS clicks_value,
       MAX(c.c_us) AS last_click_us
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.c_us BETWEEN p.p_us - 1800000000 AND p.p_us
GROUP BY p.user_id, p.purchase_id
ORDER BY p.user_id, p.purchase_id
"""


@register("e5_attribution_window", oracle=_E5_SQL,
          doc="Attribution interval join: every click within the 30 min "
              "before each purchase, per user — count/value-mass/last-click "
              "per purchase. Equi-join on user_id (one key shuffle) with a "
              "range residual, the batch twin of the watermarked "
              "stream-stream interval join in streaming/events.py.",
          tags=("events", "join", "bench"))
def e5_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"),
        "event_type", "value",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_us").alias("c_us"), "value",
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_us") >= F.col("p_us") - F.lit(1800000000))
            & (F.col("c_us") <= F.col("p_us")),
        )
        .groupBy("user_id", "purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            fpsum("value", Q20).alias("clicks_value"),
            F.max("c_us").alias("last_click_us"),
        )
        .orderBy("user_id", "purchase_id")
    )


# --- E6: semi-structured property extraction --------------------------------
# The events table carries a JSON props column; real pipelines mine
# such payloads constantly. get_json_object stays JVM-side (Jackson
# path eval per row, no Python); integer sums keep the cross-engine
# compare exact.

_E6_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("e6_props_agg", oracle=_E6_SQL,
          doc="JSON payload mining: extract props.$.k per event "
              "(get_json_object, JVM-side) and aggregate per type — "
              "integer-exact cross-engine.",
          tags=("events", "json"))
def e6_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --- E7: conversion funnel via chained as-of joins --------------------------
# view -> click (within 30 min) -> purchase (within 30 min): the
# sequential-pattern query behind funnel dashboards, expressed as two
# backward as-of joins (each one key shuffle, no range-join blowup).

_E7_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
),
p AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
v AS (SELECT user_id, ts_us FROM ev WHERE event_type = 'view'),
pc AS (
  SELECT p.user_id, p.event_id, p.ts_us,
         (SELECT MAX(c.ts_us) FROM c
          WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us) AS click_us
  FROM p
),
pcv AS (
  SELECT pc.*,
         (SELECT MAX(v.ts_us) FROM v
          WHERE v.user_id = pc.user_id AND v.ts_us <= pc.click_us) AS view_us
  FROM pc
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN click_us IS NOT NULL
                      AND ts_us - click_us <= 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_click,
       CAST(SUM(CASE WHEN click_us IS NOT NULL AND ts_us - click_us <= 1800000000
                      AND view_us IS NOT NULL AND click_us - view_us <= 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM pcv
GROUP BY user_id
ORDER BY user_id
"""


@register("e7_funnel", oracle=_E7_SQL,
          doc="view->click->purchase funnel (30-min hops) as two chained "
              "backward as-of joins (operators/asof.py) — one key shuffle "
              "each, no range-join explosion; per-user conversion counts.",
          tags=("events", "asof"))
def e7_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("ts_us").alias("click_us")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts_us", F.col("ts_us").alias("view_us")
    )
    pc = asof_join(p, c, "user_id", "ts_us", ["click_us"]).select(
        "user_id", "event_id", "ts_us", F.col("asof_click_us").alias("click_us")
    )
    # Second hop anchors on the CLICK time. Purchases with no prior
    # click skip the join entirely and union back with a null view —
    # matching the oracle's NULL-anchor semantics exactly (a "-1
    # sentinel anchor" would wrongly attach any view with ts_us <= -1,
    # i.e. pre-1970 data, where the SQL comparison against NULL
    # matches nothing).
    pc_clicked = pc.filter(F.col("click_us").isNotNull())
    pc_noclick = pc.filter(F.col("click_us").isNull())
    vc = asof_join(
        pc_clicked.withColumnRenamed("ts_us", "p_us")
        .withColumn("ts_us", F.col("click_us")),
        v,
        "user_id",
        "ts_us",
        ["view_us"],
    ).select(
        "user_id", "event_id", F.col("p_us").alias("ts_us"), "click_us",
        F.col("asof_view_us").alias("view_us"),
    ).unionByName(
        pc_noclick.select(
            "user_id", "event_id", "ts_us", "click_us",
            F.lit(None).cast("long").alias("view_us"),
        )
    )
    clicked = F.col("click_us").isNotNull() & (
        F.col("ts_us") - F.col("click_us") <= 1800000000
    )
    full = clicked & F.col("view_us").isNotNull() & (
        F.col("click_us") - F.col("view_us") <= 1800000000
    )
    return (
        vc.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(clicked.cast("int")).cast("long").alias("n_with_click"),
            F.sum(full.cast("int")).cast("long").alias("n_full_funnel"),
        )
        .orderBy("user_id")
    )


# --- E8: weekly cohort retention ---------------------------------------------

# Week buckets via integer epoch-microsecond arithmetic (TZ-proof —
# date_trunc('week') is session-timezone- and locale-sensitive).
_WEEK_US = 604_800_000_000

_E8_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
),
first_w AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT f.cohort_week,
       uw.week - f.cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM uw JOIN first_w f ON uw.user_id = f.user_id
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset
"""


@register("e8_cohort_retention", oracle=_E8_SQL,
          doc="Weekly cohort retention matrix: users bucketed by first-seen "
              "week, activity counted per week offset. Scale: one distinct "
              "on (user, week) + a min-agg and join both keyed on user_id — "
              "a single shuffle key end-to-end, no time-range explosion.",
          tags=("events",))
def e8_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("week"),
    ).distinct()
    first_w = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first_w, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- E9: hourly-count anomaly detection (z-score) ----------------------------

# All inputs to the z-score are integers (hourly counts), so E[x],
# E[x^2], the variance subtraction, sqrt, and the final division are
# single deterministic IEEE operations on identical operands — both
# engines produce the bit-identical z; rounding to 6 decimals is for
# display stability only.
_E9_SQL = """
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY hour_bucket, event_type
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n_events) AS BIGINT) AS s1,
         CAST(SUM(n_events * n_events) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
)
SELECT h.hour_bucket, h.event_type, h.n_events,
       round((h.n_events - CAST(s.s1 AS DOUBLE) / s.n_hours)
             / sqrt(CAST(s.s2 AS DOUBLE) / s.n_hours
                    - (CAST(s.s1 AS DOUBLE) / s.n_hours) * (CAST(s.s1 AS DOUBLE) / s.n_hours)),
             6) AS z
FROM hourly h JOIN stats s ON h.event_type = s.event_type
WHERE abs((h.n_events - CAST(s.s1 AS DOUBLE) / s.n_hours)
          / sqrt(CAST(s.s2 AS DOUBLE) / s.n_hours
                 - (CAST(s.s1 AS DOUBLE) / s.n_hours) * (CAST(s.s1 AS DOUBLE) / s.n_hours))) > 2.0
ORDER BY h.hour_bucket, h.event_type
"""


@register("e9_hourly_anomaly", oracle=_E9_SQL,
          doc="Anomalous hours per event type: population z-score of hourly "
              "counts over observed hours, |z| > 2 flagged. Scale: one "
              "hour/type rollup shuffle; the per-type stats table is "
              "|event_types| rows, joined back as a broadcast.",
          tags=("events",))
def e9_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.expr("unix_micros(ts) div 3600000000").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_hours")
    std = F.sqrt(
        F.col("s2").cast("double") / F.col("n_hours") - mean * mean
    )
    z = (F.col("n_events") - mean) / std
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.0)
        .select(
            "hour_bucket", "event_type", "n_events", F.round(z, 6).alias("z")
        )
        .orderBy("hour_bucket", "event_type")
    )


# --- E10: activity streaks (gaps-and-islands) --------------------------------
# The classic gaps-and-islands window pattern, absent from the rest
# of the events surface: per user, consecutive-day activity runs
# found via the (day - row_number) island key — one shuffle on
# user_id, partition-local windows, zero self-joins (the naive
# formulation is a per-user range self-join). Day boundaries are
# pure integer epoch-day arithmetic (TZ-proof, same discipline as
# e1/e8). Output: per-user activity summary + the longest streak
# (ties broken by earliest start).

_E10_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
         MIN(day) AS start_day
  FROM isl GROUP BY user_id, grp
),
best AS (
  SELECT user_id, len, start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_day) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks,
         CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days
  FROM streaks
)
SELECT user_id, n_active_days, n_streaks,
       len AS longest_streak, start_day AS streak_start_day
FROM best WHERE rk = 1
ORDER BY user_id
"""


@register("e10_activity_streaks", oracle=_E10_SQL,
          doc="Gaps-and-islands: per-user consecutive-day activity streaks "
              "via the (day - row_number) island key — one user_id shuffle, "
              "partition-local windows, no range self-join. Integer "
              "epoch-day math end to end (TZ-proof).",
          tags=("events",))
def e10_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        # ONE user_id shuffle serves the distinct, the grp window and
        # the per-user aggregates/windows below (HashPartitioning on
        # user_id satisfies every downstream ClusteredDistribution).
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    streaks = (
        isl.groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day"))
    )
    wu = Window.partitionBy("user_id")
    best = (
        streaks.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("len"), "start_day")
            ),
        )
        .withColumn("n_streaks", F.count(F.lit(1)).over(wu))
        .withColumn("n_active_days", F.sum("len").over(wu))
    )
    return (
        best.filter(F.col("rk") == 1)
        .select(
            "user_id", "n_active_days", "n_streaks",
            F.col("len").alias("longest_streak"),
            F.col("start_day").alias("streak_start_day"),
        )
        .orderBy("user_id")
    )


# --- E11: rolling 7-day distinct active users --------------------------------
# Sliding-window COUNT DISTINCT — the rollup a naive plan computes
# with a per-day range self-join (O(days x events)) or a RANGE
# window over raw events (distinct not supported in frames). The
# scale-correct shape: collapse to distinct (user, day) once, then
# each active day CONTRIBUTES to exactly the 7 window days it falls
# in (a bounded 7-way explode via sequence()), and a distinct count
# per window day finishes it — O(active_pairs x 7) work, one
# user-day shuffle, no self-join. Only days with at least one event
# in the trailing week appear (matching the oracle's generate-free
# formulation). Integer epoch-day math, TZ-proof.

_E11_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
contrib AS (
  SELECT user_id, day + off AS win_day
  FROM days, unnest(range(0, 7)) AS t(off)
),
bounds AS (SELECT MAX(day) AS max_day FROM days)
SELECT win_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau_7d
FROM contrib, bounds
WHERE win_day <= max_day
GROUP BY win_day
ORDER BY win_day
"""


@register("e11_rolling_dau", oracle=_E11_SQL,
          doc="Rolling 7-day distinct active users per day: distinct "
              "(user, day) pairs each exploded to the 7 window days they "
              "contribute to, then one distinct-count rollup — "
              "O(active_pairs x 7), no range self-join, no per-day rescan. "
              "Integer epoch-day math (TZ-proof).",
          tags=("events",))
def e11_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    max_day = days.agg(F.max("day").alias("max_day"))
    contrib = days.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_day"),
    )
    return (
        contrib.join(F.broadcast(max_day), F.col("win_day") <= F.col("max_day"))
        .groupBy("win_day")
        .agg(F.count_distinct("user_id").alias("dau_7d"))
        .orderBy("win_day")
    )


# --- E12: bucketed interval-overlap join (sessions × incidents) --------------
# The interval×interval overlap join done the distributed way: which
# user sessions overlapped an incident window (the on-call question,
# and the join shape behind ad attribution and maintenance-impact
# reports). Naive form is a range-predicate cross join (N×M); the
# scale form EXPLODES each interval into the hour buckets it spans
# (bounded: sessions are gap-bounded, incidents are hot-hour runs),
# equi-joins on the bucket, dedups the pair ids, and computes the
# exact microsecond overlap from the interval bounds — never a
# cartesian, one bucket-keyed shuffle.
#
# Left side: the e2 sessions as intervals [min ts_us, max ts_us].
# Right side: "incidents" = maximal runs of HOT hours per event type,
# hot = hourly count strictly above 2x that type's average hourly
# count, tested integer-exactly as n * n_hours > 2 * total (no
# division). Runs merge via the e10 gaps-and-islands key. All output
# columns are integers — bit-exact on any engine.

_E12_GAP_US = 1_800_000_000
_E12_HOUR_US = 3_600_000_000

_E12_SQL = f"""
WITH x AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > {_E12_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM x
),
sess AS (
  SELECT user_id, ts_us,
         -- CAST: DuckDB's windowed SUM(int) is HUGEINT (pandas
         -- float64); Spark's is BIGINT — pin the output dtype.
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
  FROM flagged
),
si AS (
  SELECT user_id, sess_id, MIN(ts_us) AS s_us, MAX(ts_us) AS e_us
  FROM sess GROUP BY user_id, sess_id
),
hr AS (
  SELECT event_type, epoch_us(ts) // {_E12_HOUR_US} AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS total, COUNT(*) AS n_hours FROM hr GROUP BY event_type),
hot AS (
  SELECT h.event_type, h.hour
  FROM hr h JOIN tot t ON h.event_type = t.event_type
  WHERE h.n * t.n_hours > 2 * t.total
),
inc AS (
  SELECT event_type, hour,
         hour - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS isl
  FROM hot
),
incidents AS (
  SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1, MIN(hour) AS incident_id
  FROM inc GROUP BY event_type, isl
),
sh AS (
  SELECT user_id, sess_id, s_us, e_us, u.h AS hour
  FROM si, unnest(range(s_us // {_E12_HOUR_US}, e_us // {_E12_HOUR_US} + 1)) AS u(h)
),
ih AS (
  SELECT event_type, incident_id, h0, h1, u.h AS hour
  FROM incidents, unnest(range(h0, h1 + 1)) AS u(h)
),
hits AS (
  SELECT DISTINCT s.user_id, s.sess_id, s.s_us, s.e_us,
                  i.event_type, i.incident_id, i.h0, i.h1
  FROM sh s JOIN ih i ON s.hour = i.hour
)
SELECT user_id, sess_id, event_type, CAST(incident_id AS BIGINT) AS incident_id,
       CAST(greatest(0,
         least(e_us + 1, (h1 + 1) * {_E12_HOUR_US})
         - greatest(s_us, h0 * {_E12_HOUR_US})) AS BIGINT) AS overlap_us
FROM hits
ORDER BY user_id, sess_id, event_type, incident_id
"""


@register("e12_session_incident_overlap", oracle=_E12_SQL,
          doc="Bucketed interval-overlap join: e2 sessions x hot-hour "
              "incident runs (hourly count > 2x type average, integer-"
              "exact rule) — intervals exploded to bounded hour buckets, "
              "equi-joined, deduped, exact microsecond overlap from the "
              "bounds; never a range cross join.",
          tags=("events", "window"))
def e12_session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w_order).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w_order)) > _E12_GAP_US),
            1,
        ).otherwise(0),
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    si = (
        flagged.withColumn("sess_id", F.sum("new_s").over(w_run))
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us"))
    )
    hr = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_E12_HOUR_US}").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = hr.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_hours")
    )
    hot = hr.join(F.broadcast(tot), "event_type").filter(
        F.col("n") * F.col("n_hours") > 2 * F.col("total")
    )
    w_isl = Window.partitionBy("event_type").orderBy("hour")
    incidents = (
        hot.withColumn("isl", F.col("hour") - F.row_number().over(w_isl))
        .groupBy("event_type", "isl")
        .agg(
            F.min("hour").alias("h0"),
            F.max("hour").alias("h1"),
            F.min("hour").alias("incident_id"),
        )
    )
    sh = si.select(
        "user_id", "sess_id", "s_us", "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {_E12_HOUR_US}"),
                F.expr(f"e_us div {_E12_HOUR_US}"),
            )
        ).alias("hour"),
    )
    from ae_data_integration_spark.functions.caching import persist_tracked

    incidents = persist_tracked(incidents)
    ih = incidents.select(
        "event_type", "incident_id", "h0", "h1",
        F.explode(F.sequence("h0", "h1")).alias("hour"),
    )
    # Incident runs are data-dependent (maximal hot-hour runs), so the
    # exploded bucket table is NOT guaranteed model-sized — hint the
    # broadcast only when its exact row count (a model-sized aggregate
    # over the persisted incidents) is bounded; above the cap the join
    # stays a plain hour-keyed equi-join (still never a range cross
    # join — the plan test asserts no CartesianProduct either way).
    n_ih = incidents.agg(
        F.sum(F.col("h1") - F.col("h0") + 1).alias("n")
    ).collect()[0]["n"]
    ih_side = F.broadcast(ih) if (n_ih or 0) <= 2_000_000 else ih
    hits = (
        sh.join(ih_side, "hour")
        .select(
            "user_id", "sess_id", "s_us", "e_us",
            "event_type", "incident_id", "h0", "h1",
        )
        .distinct()
    )
    hour_us = F.lit(_E12_HOUR_US).cast("long")
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("e_us") + 1, (F.col("h1") + 1) * hour_us)
        - F.greatest(F.col("s_us"), F.col("h0") * hour_us),
    )
    return (
        hits.select(
            "user_id", "sess_id", "event_type",
            F.col("incident_id").cast("long").alias("incident_id"),
            overlap.cast("long").alias("overlap_us"),
        )
        .orderBy("user_id", "sess_id", "event_type", "incident_id")
    )


# --- DQ5: temporal drift report ----------------------------------------------
# The training/serving-skew monitor: split the event stream at its
# temporal midpoint (integer epoch-µs arithmetic) and compare the
# event-type mixture between halves — per-type counts, shares, and an
# add-1-smoothed log-odds drift score. The alerting rule a pipeline
# applies before assuming yesterday's distribution still holds.
# Exactness: the midpoint and both count vectors are integers; shares
# divide exact longs; the one ln is rounded to 6 decimals (mix_weight
# discipline). Scale: two 1-row aggregates broadcast + one
# type-keyed count — |types| rows out at any volume.

_DQ5_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
c AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE epoch_us(ts) <= (lo + hi) // 2) AS n_first,
         COUNT(*) FILTER (WHERE epoch_us(ts) >  (lo + hi) // 2) AS n_second
  FROM events CROSS JOIN b
  GROUP BY event_type
),
t AS (SELECT SUM(n_first) AS tot1, SUM(n_second) AS tot2, COUNT(*) AS k FROM c)
SELECT event_type,
       CAST(n_first AS BIGINT) AS n_first,
       CAST(n_second AS BIGINT) AS n_second,
       n_first / CAST(tot1 AS DOUBLE) AS share_first,
       n_second / CAST(tot2 AS DOUBLE) AS share_second,
       round(ln(((n_second + 1) / CAST(tot2 + k AS DOUBLE))
                / ((n_first + 1) / CAST(tot1 + k AS DOUBLE))), 6) AS drift_log_odds
FROM c CROSS JOIN t
ORDER BY event_type
"""


@register("dq5_temporal_drift", oracle=_DQ5_SQL,
          doc="Temporal drift monitor: event-type mixture of the first vs "
              "second half of the time range (integer midpoint split), "
              "with add-1-smoothed log-odds drift per type — the "
              "distribution-shift alert a pipeline runs before reusing "
              "yesterday's statistics. Two 1-row broadcasts + one "
              "type-keyed count.",
          tags=("events", "quality"))
def dq5_temporal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    b = ev.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"))
    mid = F.expr("(lo + hi) div 2")
    c = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("ts_us") <= mid, 1)).alias("n_first"),
            F.count(F.when(F.col("ts_us") > mid, 1)).alias("n_second"),
        )
    )
    t = c.agg(
        F.sum("n_first").alias("tot1"),
        F.sum("n_second").alias("tot2"),
        F.count(F.lit(1)).alias("k"),
    )
    sh1 = F.col("n_first") / F.col("tot1").cast("double")
    sh2 = F.col("n_second") / F.col("tot2").cast("double")
    drift = F.round(
        F.log(
            ((F.col("n_second") + 1) / (F.col("tot2") + F.col("k")).cast("double"))
            / ((F.col("n_first") + 1) / (F.col("tot1") + F.col("k")).cast("double"))
        ),
        6,
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "n_first",
            "n_second",
            sh1.alias("share_first"),
            sh2.alias("share_second"),
            drift.alias("drift_log_odds"),
        )
        .orderBy("event_type")
    )
