"""Streaming corpus-lifecycle ingest — the pipe9 composition driven
by a document stream instead of one batch job.

Deployed shape: the standing corpus, its LM artifact and its PQ index
exist BEFORE documents arrive (batch builds); the stream then feeds
``foreachBatch``, and each micro-batch independently runs the ingest
front half against those frozen assets:

    micro-batch → exact-fingerprint anti-join vs corpus
                → wide-signature LSH near-dedup vs corpus
                → accepted rows  → ``out_dir/accepted/b<epoch>``
                  drop rows      → ``out_dir/drops/b<epoch>``
                                   (doc_id, source, signal∈{exact,near})
                → accepted embeddings appended to the PQ index under
                  FROZEN codebooks (``codes_b<epoch>`` increment)

Because every document is deduped against the CORPUS (batch docs are
not deduped against each other — pipe5 semantics) and scored/encoded
against frozen artifacts, the drained stream's accepted set, drop
provenance and index are BIT-IDENTICAL to the single-shot pipe9 run
over the same documents; the final manifest job
(catalog/lifecycle_q.lifecycle_report — LM terciles need the WHOLE
accepted set, so they are a post-drain batch job by construction)
then produces an identical report. tests/test_streaming.py asserts
that equality end to end.

Exactly-once: every per-epoch artifact (accepted/drops parquet dirs,
the codes increment) is written mode="overwrite" under an epoch-tagged
name, so a replayed epoch rewrites the same deterministic content
instead of duplicating — the ann_ingest discipline extended to the
document sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_stream_to_lifecycle(
    doc_stream: DataFrame,
    corpus: DataFrame,
    emb: DataFrame,
    out_dir: str,
    index_path: str,
    query_name: str = "lifecycle_ingest",
    checkpoint_dir: str | None = None,
):
    """Drain ``doc_stream`` (availableNow) through the lifecycle
    front half against the static ``corpus``; per-epoch accepted/drop
    parquet sinks under ``out_dir`` and index increments at
    ``index_path``. Returns the finished StreamingQuery."""
    from ae_data_integration_spark.catalog.dedup_q import _P5_THRESH
    from ae_data_integration_spark.functions.text import fingerprint
    from ae_data_integration_spark.operators.ann_index import append_to_pq_index
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_band_table,
        lsh_candidate_pairs_from_bands,
    )

    # corpus-side assets persist ONCE per drain and amortize over
    # every micro-batch: the fingerprint set and the corpus band
    # table (the minhash pass over the standing corpus is the
    # expensive term — recomputing it per epoch would make ingest
    # cost ∝ corpus x batches instead of corpus + Σbatch)
    corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct().persist()
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)
    bb = lsh_band_table(sh_c, 16, 2).persist()

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        # deliberately NO empty-batch early return: a replay after
        # checkpoint loss may map files to different epoch ids, and an
        # epoch that becomes empty must OVERWRITE (clear) its possibly
        # stale dir — skipping it would leave the old content beside
        # the same docs re-homed under another tag (duplicates).
        b1 = (
            bdf.withColumn("fp", fingerprint("text"))
            .join(corpus_fp, "fp", "left_anti")
            .select("doc_id", "source", "text")
            .persist()
        )
        try:
            sh_b = doc_shingles(b1, "doc_id", "text", k=5, spread=True)
            ba = lsh_band_table(sh_b, 16, 2)
            cands = lsh_candidate_pairs_from_bands(ba, bb)
            near = (
                jaccard_verify(
                    cands, sh_b.unionByName(sh_c), threshold=_P5_THRESH
                )
                .select(F.col("doc_a").alias("doc_id"))
                .distinct()
                .persist()
            )
            try:
                acc = b1.join(near, "doc_id", "left_anti").select(
                    "doc_id", "source", "text"
                )
                drops = (
                    bdf.join(b1.select("doc_id"), "doc_id", "left_anti")
                    .select("doc_id", "source", F.lit("exact").alias("signal"))
                    .unionByName(
                        b1.join(near, "doc_id", "left_semi").select(
                            "doc_id", "source", F.lit("near").alias("signal")
                        )
                    )
                )
                acc.write.mode("overwrite").parquet(
                    f"{out_dir}/accepted/b{epoch_id}"
                )
                drops.write.mode("overwrite").parquet(
                    f"{out_dir}/drops/b{epoch_id}"
                )
                acc_e = emb.join(
                    acc.select(F.col("doc_id").alias("vec_id")), "vec_id"
                )
                append_to_pq_index(acc_e, index_path, tag=f"b{epoch_id}")
            finally:
                near.unpersist()
        finally:
            b1.unpersist()

    w = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        # with a checkpoint, a restarted drain RESUMES (new files only,
        # epoch ids continue); without one, a restart replays the whole
        # source — harmless either way because every per-epoch artifact
        # is a deterministic overwrite (tested in test_streaming.py)
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    try:
        q.awaitTermination()
    finally:
        corpus_fp.unpersist()
        bb.unpersist()
    return q
