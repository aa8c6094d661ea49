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


@register("y_m1_binary_features", oracle=_M1_SQL,
          doc="Binary payload → mapInPandas feature extraction (multimodal "
              "plumbing; decode kernels stubbed, Arrow round-trip real).",
          tags=("multimodal",))
def m1_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payload = attach_binary_payload(d, "text").select("doc_id", "content")
    return extract_binary_features(payload, "doc_id", "content").orderBy("doc_id")


# --- M2: frame sampling (1→N generator through Arrow) -----------------------

_M2_SQL = """
SELECT doc_id,
       CAST(f.f AS BIGINT) AS frame_idx,
       md5(substr(text, (length(text) * f.f) // 4 + 1,
                  (length(text) * (f.f + 1)) // 4 - (length(text) * f.f) // 4)) AS frame_md5,
       CAST((length(text) * (f.f + 1)) // 4 - (length(text) * f.f) // 4 AS BIGINT) AS frame_bytes
FROM documents, (SELECT unnest(range(0, 4)) AS f) f
ORDER BY doc_id, frame_idx
"""


@register("y_m2_frame_samples", oracle=_M2_SQL,
          doc="Video-style frame sampling: 1 payload → 4 frame rows via "
              "mapInPandas (decode stubbed as deterministic byte slices, "
              "so the oracle verifies the whole 1→N Arrow path).",
          tags=("multimodal",))
def m2_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.multimodal import sample_frames

    d = table(spark, sf_dir, "documents")
    payload = attach_binary_payload(d, "text").select("doc_id", "content")
    return sample_frames(payload, n_frames=4).orderBy("doc_id", "frame_idx")
