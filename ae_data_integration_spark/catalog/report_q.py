"""Reporting-layer queries (SURVEY §3.3, §2.10 R-layer parity).

The evaluation notebook's harvest/pivot/best-trial moves: row-mean +
argmin best-trial selection (AE_results.ipynb cell 57 `cv_sum` /
`which.min`) and melt/unpivot (cells 130/133 `pivot_longer`),
re-expressed over the driver's tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.catalog.events_q import EVENT_TYPES, e3_type_pivot
from ae_data_integration_spark.functions.portable import Q20, fpavg
from ae_data_integration_spark.tables import table

# --- REP1: row-mean + argmin best-trial selection ---------------------------

_REP1_SQL = """
SELECT o_custkey AS best_custkey, avg_price, n_orders
FROM (
  SELECT o_custkey,
         (SUM(CAST(round(o_totalprice * 1048576) AS BIGINT)) / 1048576.0)
           / CAST(COUNT(*) AS DOUBLE) AS avg_price,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
)
ORDER BY avg_price, best_custkey
LIMIT 1
"""


@register("rep1_argmin_best", oracle=_REP1_SQL,
          doc="rowMeans + which.min best-trial selection "
              "(ref AE_results.ipynb cell 57).",
          tags=("report", "topk"))
def rep1_argmin_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    means = o.groupBy("o_custkey").agg(
        fpavg("o_totalprice", Q20).alias("avg_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        means.orderBy("avg_price", "o_custkey")
        .limit(1)
        .select(F.col("o_custkey").alias("best_custkey"), "avg_price", "n_orders")
    )


# --- REP2: melt / unpivot (pivot_longer parity) -----------------------------

_REP2_SQL = """
WITH wide AS (
  SELECT user_id % 10 AS cohort,
         COUNT(*) FILTER (WHERE event_type = 'click') AS click,
         COUNT(*) FILTER (WHERE event_type = 'error') AS error,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
         COUNT(*) FILTER (WHERE event_type = 'view') AS view
  FROM events GROUP BY cohort
)
SELECT cohort, etype, n FROM (
  SELECT cohort, 'click' AS etype, click AS n FROM wide
  UNION ALL SELECT cohort, 'error', error FROM wide
  UNION ALL SELECT cohort, 'purchase', purchase FROM wide
  UNION ALL SELECT cohort, 'signup', signup FROM wide
  UNION ALL SELECT cohort, 'view', view FROM wide
)
ORDER BY cohort, etype
"""


@register("rep2_melt", oracle=_REP2_SQL,
          doc="Unpivot wide→long (ref AE_results.ipynb cells 130/133 "
              "pivot_longer) via stack().",
          tags=("report", "pivot"))
def rep2_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = e3_type_pivot(spark, sf_dir)
    stack_args = ", ".join(f"'{t}', {t}" for t in EVENT_TYPES)
    return (
        wide.select(
            "cohort",
            F.expr(f"stack({len(EVENT_TYPES)}, {stack_args}) AS (etype, n)"),
        )
        .orderBy("cohort", "etype")
    )
