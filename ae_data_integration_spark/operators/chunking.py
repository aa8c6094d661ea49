"""Document chunking and sequence packing — the tokenize → chunk →
pack stages of an LLM training-data pipeline.

- `chunk_tokens`: split each document's token stream into fixed-size
  overlapping chunks (sliding window, stride = chunk - overlap).
  Pure per-row array arithmetic + a generator explode: a map stage,
  zero shuffle, embarrassingly parallel at any scale.
- `pack_chunks`: assign chunks to fixed-capacity context bins by a
  running token count. A GLOBAL packing order is a scale anti-pattern
  (one giant window), so packing runs within md5-derived SHARDS: one
  key shuffle, each shard packs independently and deterministically —
  the layout any distributed sequence-packer actually uses. The
  cumulative-sum-then-floor rule gives first-fit-in-order semantics
  where a chunk may straddle two bins' boundary accounting (bin =
  floor((cum-1)/ctx)); capacity accounting, not byte-perfect
  concatenation, which is what batch-shape planning needs.

Every step is integer arithmetic over md5-derived shards, so the
DuckDB oracle replays both operators bit-exactly (catalog t7/t8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.hashing import md5_bucket
from ae_data_integration_spark.functions.text import tokens


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_hash) per sliding-window chunk.

    n_chunks = max(ceil((n - overlap) / stride), 1) in exact integer
    arithmetic; every document yields at least one chunk. chunk_hash
    is md5 of the space-rejoined token slice (stable fingerprint of
    the chunk content — the content itself stays an array)."""
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    if overlap < 0 or overlap >= chunk:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk, got "
            f"overlap={overlap}, chunk={chunk} (stride would be <= 0)"
        )
    stride = chunk - overlap
    tok = df.select(F.col(id_col), tokens(text_col).alias("t"))
    n = F.size("t")
    n_chunks = F.greatest(
        ((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast("long"),
        F.lit(1),
    )
    c = tok.select(
        id_col,
        "t",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    piece = F.slice("t", F.col("chunk_id").cast("int") * stride + 1, chunk)
    return c.select(
        id_col,
        "chunk_id",
        F.size(piece).cast("long").alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    ctx: int = 512,
    n_shards: int = 16,
) -> DataFrame:
    """Per (shard, bin) packing summary: n_chunks, n_tokens, fill.

    Shard = md5(id) bucket; within a shard, chunks pack in
    (id, chunk_id) order by running token count into ctx-capacity
    bins. Deterministic on any cluster layout; the only shuffle is
    the shard key."""
    shard = md5_bucket(id_col, n_shards, salt="pack:")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = chunks.withColumn("shard", shard).select(
        "shard",
        id_col,
        "chunk_id",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.lit(1)) / F.lit(ctx)).alias("bin"),
    )
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn("fill", F.col("bin_tokens").cast("double") / F.lit(float(ctx)))
    )
