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


# --- M3: vectorized nibble-histogram signature (real numpy kernel) ----------
# The first NON-stub kernel in the family: np.frombuffer + bincount
# over the raw payload bytes — the exact shape a real decode+feature
# step takes (zero-copy Arrow batch in, C-speed per batch, exact
# integer features out). top_nibble = argmax bin with first-index
# tie-break, identical in both engines.

_M3_SQL = """
WITH nib AS (
  SELECT doc_id,
         list_transform(range(0, 16), b -> CAST(length(list_filter(
             list_transform(range(1, length(text) + 1), i -> ascii(text[i:i]) // 16),
             x -> x = b)) AS BIGINT)) AS hist,
         CAST(length(text) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT doc_id, array_to_string(hist, ':') AS hist_sig, n_bytes,
       CAST(list_position(hist, list_max(hist)) - 1 AS BIGINT) AS top_nibble
FROM nib
ORDER BY doc_id
"""


@register("y_m3_nibble_histogram", oracle=_M3_SQL,
          doc="Vectorized byte-signature kernel (np.frombuffer + bincount "
              "over the binary payload, 16 high-nibble bins): the family's "
              "first real (non-stub) numpy kernel; exact-integer output, "
              "zero shuffle, oracle replays it from the text bytes.",
          tags=("multimodal",))
def m3_nibble_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ae_data_integration_spark.operators.multimodal import nibble_histogram

    d = table(spark, sf_dir, "documents")
    payload = attach_binary_payload(d, "text").select("doc_id", "content")
    h = nibble_histogram(payload, "doc_id", "content")
    # hist serialized to a canonical string: the parity harness value-
    # hashes scalar columns only, and the ':'-join loses nothing
    # (exact integers, fixed 16 bins).
    return h.select(
        "doc_id",
        F.array_join(F.transform("hist", lambda x: x.cast("string")), ":")
        .alias("hist_sig"),
        "n_bytes",
        (F.array_position("hist", F.array_max("hist")) - 1)
        .cast("long").alias("top_nibble"),
    ).orderBy("doc_id")
