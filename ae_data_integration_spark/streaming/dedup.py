"""Streaming near-duplicate detection — the stateful streaming twin
of the batch MinHash-LSH dedup (operators/dedup.py).

A continuous ingestion pipeline can't re-run batch dedup per
micro-batch over the whole corpus; instead the LSH band table IS the
state: the signature computation (shingles → minhash → bands) is
STATELESS and reuses the exact JVM expressions of the batch path, so
stream and batch bucket identically; then a per-(band, bucket)
``applyInPandasWithState`` keeps the doc ids seen in each bucket and
emits a candidate pair the moment a new doc lands in a non-empty
bucket.

State per key is a capped id list (``max_bucket``), so memory is
bounded by (#non-empty buckets × max_bucket) — the same skew guard
the batch path applies; a hot bucket stops emitting (and warns via
the `truncated` flag in its state) instead of exploding quadratically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from ae_data_integration_spark.functions.hashing import (
    char_array,
    lsh_bands,
    minhash_signature,
    shingles_from_chars,
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("truncated", BooleanType()),
    ]
)


def band_stream(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 8,
    num_bands: int = 2,
) -> DataFrame:
    """Stateless (doc, band, bucket) stream — identical expressions to
    the batch band table, so buckets match bit-for-bit."""
    rpb = num_perm // num_bands
    # two-step char-array shingling (the batch doc_shingles fix):
    # O(len) per doc vs the substr form's O(len^2)
    sig = docs.select(
        F.col(key_col).alias("doc"), char_array(text_col).alias("_ch")
    ).select(
        "doc",
        minhash_signature(shingles_from_chars("_ch", k), num_perm).alias("sig"),
    )
    return sig.select(
        "doc", F.explode(lsh_bands("sig", num_bands, rpb)).alias("b")
    ).select("doc", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))


def near_dup_candidates_stream(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 8,
    num_bands: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """(doc_a, doc_b) candidate-pair stream, doc_a < doc_b, emitted as
    soon as both docs have arrived. Distinct-ness across bands is the
    consumer's dedup (same as the batch path's final .distinct())."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, truncated = state.get
            ids = list(ids)
        else:
            ids, truncated = [], False
        new_ids: list[int] = []
        for p in pdfs:
            new_ids.extend(int(d) for d in p["doc"])
        new_ids.sort()
        pairs: list[tuple[int, int]] = []
        for d in new_ids:
            if d in ids:
                continue
            if not truncated:
                for seen in ids:
                    if seen != d:
                        pairs.append((min(seen, d), max(seen, d)))
            if len(ids) < max_bucket:
                ids.append(d)
            else:
                truncated = True  # hot bucket: stop pairing, keep cap
        state.update((ids, truncated))
        if pairs:
            yield pd.DataFrame(
                {"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]}
            )

    bands = band_stream(docs, key_col, text_col, k, num_perm, num_bands)
    return bands.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
