"""Sketch queries: Count-Min frequency estimation under the full
value-hash gate.

The CMS is md5-hashed (functions/hashing.md5_bucket), so DuckDB
rebuilds the identical d x w integer cell grid and the identical
min-over-cells estimates — a sketch whose every cell is
cross-engine-verified. HLL/quantile sketches are engine-internal
state and live in pytest (tests/test_sketch.py) with tolerance
checks against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.sketch import cms_build, cms_estimate
from ae_data_integration_spark.tables import table

_D, _W = 4, 64

_B = (
    "CAST(('0x' || substr(md5('cms' || r.r || ':' || CAST({key} AS VARCHAR)), 1, 12)) "
    "AS BIGINT) % {w}"
)

_SK1_SQL = f"""
WITH ev AS (SELECT user_id FROM events),
rs AS (SELECT unnest(range(0, {_D})) AS r),
cells AS (
  SELECT r.r AS r, {_B.format(key="ev.user_id", w=_W)} AS b, COUNT(*) AS cnt
  FROM ev, rs r GROUP BY 1, 2
),
ex AS (
  SELECT user_id, COUNT(*) AS exact_n FROM ev GROUP BY user_id
  ORDER BY exact_n DESC, user_id LIMIT 10
),
est AS (
  SELECT e.user_id, e.exact_n, MIN(COALESCE(c.cnt, 0)) AS cms_n
  FROM ex e CROSS JOIN rs r
  LEFT JOIN cells c ON c.r = r.r AND c.b = {_B.format(key="e.user_id", w=_W)}
  GROUP BY e.user_id, e.exact_n
)
SELECT user_id, exact_n, cms_n FROM est ORDER BY exact_n DESC, user_id
"""


@register("sk1_cms_heavy_hitters", oracle=_SK1_SQL,
          doc="Count-Min sketch frequency estimates for the top-10 users by "
              "event count, next to exact counts — the d x w md5-hashed cell "
              "grid and the min-over-cells estimates are integer arithmetic "
              "both engines reproduce bit-exactly. Sketch build = one "
              "map-side-combined agg to d*w cells; estimate = broadcast "
              "join of the cell table.",
          tags=("sketch", "bench"))
def sk1_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id", d=_D, w=_W)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    return cms_estimate(sketch, top, "user_id", d=_D, w=_W).orderBy(
        F.desc("exact_n"), "user_id"
    )


# --- SK2: K-minimum-values distinct estimation ------------------------------

_K2 = 32

_SK2_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
),
h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)
           / 281474976710656.0 AS h
  FROM d
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM h
),
agg AS (
  SELECT event_type, COUNT(*) AS n_exact,
         MAX(CASE WHEN rk = {_K2} THEN h END) AS hk
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_exact,
       CASE WHEN hk IS NOT NULL THEN {float(_K2 - 1)!r} / hk
            ELSE CAST(n_exact AS DOUBLE) END AS kmv_est
FROM agg
ORDER BY event_type
"""


@register("sk2_kmv_distinct", oracle=_SK2_SQL,
          doc="K-minimum-values distinct-user estimate per event type "
              "(k=32) next to the exact count — an md5-deterministic "
              "distinct sketch whose estimate both engines reproduce "
              "bit-exactly (HLL++ gives the same bound but engine-internal "
              "state; KMV puts the sketch itself under the value-hash "
              "gate). One distinct + one per-group hash window.",
          tags=("sketch",))
def sk2_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.sketch import kmv_distinct

    ev = table(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", "event_type", k=_K2).orderBy("event_type")
