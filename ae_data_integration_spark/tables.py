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
        # ts is TIMESTAMP(NANOS) parquet, which Spark cannot read
        # natively. Set the legacy conf at runtime (the driver's own
        # session won't have it at build time), read nanos as long,
        # truncate to micros — exactly what DuckDB's micro-resolution
        # TIMESTAMP does.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views for spark.sql plans."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
