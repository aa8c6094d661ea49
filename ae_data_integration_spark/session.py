"""SparkSession factory with scale-oriented defaults.

Defaults target correctness at local[32] test scale while remaining
the right knobs for a 1000-executor cluster: AQE on (runtime shuffle
coalescing + skew-join splitting), broadcast threshold high enough to
catch every dimension table in the star schema, Arrow enabled for the
pandas-UDF bridge.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ae_data_integration_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # One shuffle partition per core locally; on a real cluster this
        # is set to ~2-3x total cores — AQE coalesces the excess.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Every table except lineitem/orders/documents/embeddings is a
        # dimension — make sure Catalyst broadcasts them.
        .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
        # Arrow for the mapInPandas / pandas_udf bridge (model layer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Stable session timezone so timestamp formatting is portable.
        .config("spark.sql.session.timeZone", "UTC")
        # The events table stores TIMESTAMP(NANOS) parquet, which Spark
        # has no native type for — read as long and convert (tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` below
        # every explode; predicate pushdown then substitutes the alias
        # chain, re-inlining the WHOLE array expression (shingles,
        # tokens) into a per-scan-row filter — with HOF lambdas that
        # means e.g. split(text) re-evaluated per element, an O(len^2)
        # pass over every document BEFORE the real computation. The
        # filter is semantically vacuous here (explode drops empty
        # arrays anyway; it exists only to prune rows early), and
        # excluding the rule cut the sf10 corpus band table from 36 s
        # to 10 s — and a zipf doc-length corpus from a 13.7x blow-up
        # to linear (SCALE_SPOT_r12 doc_skew_study).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # local[32] runs every task inside the driver JVM: 32 concurrent
        # tasks each buffering shuffle writes for the wide-matrix melt
        # (38M cells, tests/test_report_full_width.py) OOM an 8g heap
        # intermittently. The container has 128 GiB; 20g leaves head-
        # room without starving the OS page cache the parquet scans use.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
