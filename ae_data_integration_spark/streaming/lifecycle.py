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

Replay after checkpoint loss (ADVICE r11 #3): overwrite-idempotence
only covers epoch ids the replay REACHES. A full-source replay whose
reader options batch the files differently (e.g. maxFilesPerTrigger
absent where the original run had =1) re-homes every doc into FEWER
epochs, leaving the original run's higher-numbered accepted/b<N>,
drops/b<N> dirs and codes_b<N> index increments stale — duplicated
docs in the post-drain unions and the served index. The drain
therefore tracks the epoch ids it actually ran and, on completion,
SWEEPS per-epoch artifacts above its own max epoch (manifest flip
before rmtree for index increments, ann_index.remove_increment). A
stale tag that was already COMPACTED into the index base cannot be
unmerged — that layout raises loudly and requires an index rebuild
(compact-then-lose-checkpoint-then-replay-smaller is a rebuild, not
a sweep). A drain that processes zero batches sweeps nothing: a
resume with no new files has nothing stale by construction, and an
empty-source replay has no epoch range to sweep against.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH_PAT = re.compile(r"^b(\d+)$")


def _sweep_stale_epochs(out_dir: str, index_path: str, max_epoch: int) -> None:
    """Retire per-epoch artifacts with epoch ids ABOVE the finished
    drain's range — the stale leftovers of a replay that re-homed the
    source into fewer epochs (see module docstring)."""
    from ae_data_integration_spark.operators.ann_index import (
        _merged_tags,
        remove_increment,
    )

    for sub in ("accepted", "drops"):
        for d in glob.glob(os.path.join(out_dir, sub, "b*")):
            m = _EPOCH_PAT.match(os.path.basename(d))
            if m and int(m.group(1)) > max_epoch:
                shutil.rmtree(d, ignore_errors=True)
    stale_merged = [
        t for t in _merged_tags(index_path)
        if (m := _EPOCH_PAT.match(t)) and int(m.group(1)) > max_epoch
    ]
    if stale_merged:
        raise RuntimeError(
            f"stale epoch tags {stale_merged} were already compacted into "
            f"the index base at {index_path} and cannot be swept — rebuild "
            "the index before serving this replayed drain"
        )
    for d in glob.glob(os.path.join(index_path, "codes_b*")):
        name = os.path.basename(d)
        m = _EPOCH_PAT.match(name[len("codes_"):])
        if m and int(m.group(1)) > max_epoch:
            remove_increment(index_path, name)


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
    # cost ∝ corpus x batches instead of corpus + Σbatch).
    # Measured at 100x (sf10, 20-file batch; SCALE_SPOT_r12
    # stream_cadence_study): a 20-epoch maxFilesPerTrigger=1 drain
    # runs 6.0 s/epoch vs 32.9 s single-shot — per-epoch fixed cost
    # 4.6 s (trigger scheduling + three sink commits + one cheap
    # corpus (doc_id, text) scan for the candidate-pruned verify
    # below). Before that prune the fixed cost was 21.6 s/epoch:
    # the whole-corpus shingle-array rebuild per micro-batch.
    corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct().persist()
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)
    bb = lsh_band_table(sh_c, 16, 2).persist()

    seen_epochs: list[int] = []

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        seen_epochs.append(int(epoch_id))
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
            cands = lsh_candidate_pairs_from_bands(ba, bb).persist()
            # per-epoch fixed-cost control (the cadence study,
            # SCALE_SPOT_r12): verify only needs shingle arrays for
            # docs that appear in a candidate pair, and jaccard_verify's
            # own prune lands ABOVE the array construction — so without
            # this, every micro-batch would rebuild shingle arrays for
            # the WHOLE corpus (ingest cost ∝ corpus x epochs). Pruning
            # the corpus TEXT to candidate doc_b ids first makes the
            # per-epoch corpus term one cheap (doc_id, text) scan +
            # broadcast semi join; the expensive transform runs on
            # candidate docs only. Value-identical: non-candidate docs
            # never reach the verify join.
            cand_c = corpus.join(
                F.broadcast(
                    cands.select(F.col("doc_b").alias("doc_id")).distinct()
                ),
                "doc_id",
                "left_semi",
            )
            sh_c_cand = doc_shingles(cand_c, "doc_id", "text", k=5, spread=True)
            near = (
                jaccard_verify(
                    cands, sh_b.unionByName(sh_c_cand), threshold=_P5_THRESH
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
                cands.unpersist()
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
    if seen_epochs:
        _sweep_stale_epochs(out_dir, index_path, max(seen_epochs))
    return q
