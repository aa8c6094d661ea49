"""Loaders for the driver's deterministic synthetic star schema.

``/root/testdata/sf*/`` holds TPC-H-ish parquet plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings``
(vector corpus). Parquet scans get predicate pushdown + column
pruning from Catalyst for free — callers should ``select`` early.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver has shipped events.ts in three physical layouts
        # across rounds: TIMESTAMP(NANOS) (unreadable natively — needs
        # the legacy nanos-as-long conf), timestamp[us] (Spark reads it
        # as TIMESTAMP_NTZ), and plain TIMESTAMP. Set the legacy conf
        # unconditionally (harmless for the non-nanos layouts), then
        # type-dispatch on what actually materialized and normalize to
        # session-TZ-free TIMESTAMP so downstream `unix_micros(ts)`
        # matches DuckDB's `epoch_us` (UTC) exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # legacy nanos-as-long → truncate to micros (DuckDB's
            # micro-resolution TIMESTAMP does the same).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # NTZ → micros-since-epoch via a timezone-free diff against
            # the NTZ epoch literal, then rebuild as TIMESTAMP. Going
            # through `cast` instead would apply the session timezone
            # and break under the driver's unknown TZ.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        # TimestampType: already what downstream expects.
    return df


def epoch_us_col(df: DataFrame, col: str) -> "F.Column":
    """Microseconds-since-epoch for a timestamp column, independent of
    whether parquet materialized it as TIMESTAMP or TIMESTAMP_NTZ and
    of the session timezone (NTZ values are read as-written, i.e. the
    generator's UTC — matching DuckDB's epoch_us). A plain cast
    NTZ→TIMESTAMP would apply the session TZ and break under the
    driver's unknown timezone."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(col)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views for spark.sql plans."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
