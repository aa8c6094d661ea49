"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship prep pipeline (SURVEY §7 stage-1
slice) at sf0.001. ``queries()``/``oracle_sql()`` expose the full
catalog (ae_data_integration_spark/catalog/) — every implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions
(dedup, similarity, text analysis), each paired with a DuckDB-
runnable ANSI-SQL oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ae_data_integration_spark.catalog import load_all, oracle_for

# The driver's correctness gate runs Spark + DuckDB side-by-side at
# this scale; callable oracles (data-derived literals) resolve here.
_CORRECTNESS_SF_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["prep_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog query."""
    return {
        name: oracle_for(q, _CORRECTNESS_SF_DIR)
        for name, q in sorted(load_all().items())
        if q.oracle is not None
    }
