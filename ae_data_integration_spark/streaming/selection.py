"""Streaming DSIR selection — Gumbel top-k as a mergeable sketch
over a document stream.

The batch row (samp3) scores the whole corpus and takes one global
top-k. On an ingestion pipeline the lr model is the offline artifact
(same lifecycle as the LM tables and ANN codebooks) and selection
must run incrementally: each micro-batch scores its documents
against the broadcast lr table and MERGES into a retained top-k
state. Gumbel top-k supports exactly that — it is an order
statistic of per-doc keys, so

    topk(A ∪ B) = topk(topk(A) ∪ topk(B))

(the KMV-union argument, functions/sketch.py), and because every
key is md5-derived from the doc id alone, re-scoring a replayed
micro-batch produces byte-identical rows: the merge dedups by
doc_id, making the sink idempotent under checkpoint loss.

State is k rows — driver-readable, stored as one parquet overwrite
per epoch. tests/test_streaming.py asserts the drained state equals
the batch samp3 selection bit-for-bit and that a full replay is a
no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ae_data_integration_spark.operators.selection import (
    DSIR_K,
    dsir_doc_keys,
    gumbel_topk_merge,
)


def dsir_select_stream(
    doc_stream: DataFrame,
    lr: DataFrame,
    state_dir: str,
    k: int = DSIR_K,
    query_name: str = "dsir_select",
    checkpoint_dir: str | None = None,
):
    """Drain ``doc_stream`` (availableNow), maintaining the Gumbel
    top-``k`` selection under the STATIC ``lr`` model at
    ``state_dir`` (a k-row parquet, overwritten per epoch)."""
    spark = doc_stream.sparkSession

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        if bdf.isEmpty():
            # merge is a pure accumulator (no per-epoch artifact to
            # clear, unlike lifecycle.py's tagged dirs): an empty
            # replayed epoch has nothing to contribute or overwrite
            return
        keys = dsir_doc_keys(bdf, lr)
        try:
            state = spark.read.parquet(state_dir)
        except Exception:  # noqa: BLE001 - first epoch: no state yet
            state = None
        merged = gumbel_topk_merge(state, keys, k).collect()  # k rows
        spark.createDataFrame(merged, keys.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir)

    w = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.awaitTermination()
    return q
