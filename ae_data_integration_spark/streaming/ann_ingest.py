"""Streaming ANN index ingest — arriving vectors appended to a
persisted PQ index per micro-batch.

The deployed shape of the s6i lifecycle: the index is built once on
the base corpus (a batch job); the vector stream then feeds
``foreachBatch``, and each micro-batch is encoded under the FROZEN
codebooks and appended as its own ``codes_b<batch_id>`` increment.
Because encoding is per-row (one broadcast of the model-sized
codebook, no cross-batch state), the drained stream's index is
BIT-IDENTICAL to a single-shot append of the same vectors — the
stream==batch equality the other streaming twins assert, extended to
an artifact instead of a result frame (tests/test_streaming.py).

Exactly-once notes: the micro-batch epoch id tags the increment dir,
and append_to_pq_index overwrites per tag — a replayed epoch (crash
between sink commit and checkpoint write) rewrites the same dir with
the same deterministic content instead of duplicating. Folded tags
(post-compaction) are recorded no-ops, so compaction can run between
micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ingest_stream_to_pq_index(
    vec_stream: DataFrame,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_name: str = "ann_ingest",
):
    """Start (availableNow) a foreachBatch writer appending every
    micro-batch of ``vec_stream`` to the PQ index at ``path``.
    Returns the finished StreamingQuery."""
    from ae_data_integration_spark.operators.ann_index import append_to_pq_index

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_pq_index(
            batch_df, path, tag=f"b{epoch_id}", key_col=key_col, vec_col=vec_col
        )

    q = (
        vec_stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
