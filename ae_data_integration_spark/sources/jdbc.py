"""JDBC source/sink (the BASELINE north-star "multi-source" leg).

The reference ingests only local TSV/CSV; a production deployment of
the same workflow pulls dimension/clinical tables from relational
stores. Spark-first shape:

* Reads are PARTITIONED — `partitionColumn/lowerBound/upperBound/
  numPartitions` splits the table into range-predicate queries that
  executors run concurrently. An unpartitioned JDBC read is one
  executor pulling the whole table through one connection — the
  classic 100-TB scale-killer, so `read_jdbc` makes the partition
  spec the primary signature, not an afterthought in an options dict.
* Filters and column pruning push down: Catalyst turns
  `.filter(...).select(...)` over a JDBC relation into WHERE/SELECT
  in the generated SQL (visible as PushedFilters in the plan), so the
  database does the reduction, not the network.
* Writes batch rows per partition (`batchsize`), one connection per
  output partition — `df.repartition(n)` before the write is the
  writer-side parallelism knob.

Tested round-trip against the Derby engine embedded in the Spark JVM
(no external service in this container; the option surface is
identical for Postgres/MySQL — swap url + driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    driver: str | None = None,
    fetchsize: int = 10_000,
    options: dict | None = None,
) -> DataFrame:
    """Partitioned JDBC read.

    `table` may be a table name or a derived-table subquery like
    ``"(SELECT ... ) t"``. With a partition spec, Spark issues
    `numPartitions` concurrent range queries on `partition_column`
    (must be numeric/date/timestamp); without one it falls back to a
    single-connection read — acceptable only for dimension tables.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    driver: str | None = None,
    batchsize: int = 10_000,
    options: dict | None = None,
) -> None:
    """JDBC sink: one connection per input partition, `batchsize` rows
    per INSERT batch. Repartition upstream to control writer
    parallelism (and to stay under the database's connection cap)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def derby_url(db_dir: str, create: bool = True) -> str:
    """Embedded-Derby JDBC url for tests/fixtures (runs inside the
    Spark JVM — no external database needed)."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_dir}{suffix}"
