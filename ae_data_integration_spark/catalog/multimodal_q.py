"""Multimodal-column queries: binary payload plumbing through Arrow.

m1 runs the real mapInPandas binary feature extractor
(operators/multimodal.py) and is still oracle-checkable because the
stub features are deterministic byte math DuckDB can replicate —
the strongest possible check that binary columns survive the
Spark→Arrow→pandas round-trip unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.operators.multimodal import (
    attach_binary_payload,
    extract_binary_features,
)
from ae_data_integration_spark.tables import table

_M1_SQL = """
SELECT doc_id,
       md5(text) AS content_md5,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(list_reduce(list_transform(range(1, least(8, length(text)) + 1),
                                       i -> ascii(text[i:i])),
                        (a, b) -> a + b) AS BIGINT) AS head_sum
FROM documents
ORDER BY doc_id
"""


@register("m1_binary_features", oracle=_M1_SQL,
          doc="Binary payload → mapInPandas feature extraction (multimodal "
              "plumbing; decode kernels stubbed, Arrow round-trip real).",
          tags=("multimodal",))
def m1_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payload = attach_binary_payload(d, "text").select("doc_id", "content")
    return extract_binary_features(payload, "doc_id", "content").orderBy("doc_id")
