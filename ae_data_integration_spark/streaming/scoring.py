"""Streaming LM perplexity scoring — the t23 quality filter applied
to a document STREAM against a broadcast model artifact.

This is how the CCNet stage deploys on an ingestion pipeline: the
bigram LM is trained offline on the reference slice (a batch job,
the model tables are the artifact — same lifecycle as the ANN
codebooks in operators/ann_index.py), and arriving documents are
scored statelessly: vocab mapping and bigram construction are
per-row array transforms, the model attaches via stream-static
broadcast joins, and the only stateful operator is the per-doc
aggregate (bounded: one row per doc in flight). No watermark is
needed for correctness because every document's tokens arrive in one
row; the aggregate exists to reuse the batch expressions verbatim.

tests/test_streaming.py asserts stream == batch (_t23_scored)
exactly — same Q30-quantized NLL math, same left-join miss semantics
for OOV bigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ae_data_integration_spark.operators.lm import bigram_pairs, score_pairs


def lm_score_stream(
    docs: DataFrame,
    vocab: list[str],
    bg: DataFrame,
    ctx: DataFrame,
    emit: int,
    text_tokens_col: str = "t",
) -> DataFrame:
    """(doc_id, n_tok, avg_nll) for a streaming frame of documents
    carrying a tokenized array column. ``bg``/``ctx`` are STATIC
    model frames (the trained artifact); they broadcast into every
    micro-batch."""
    pairs = bigram_pairs(docs, vocab, text_tokens_col, keep=("doc_id",))
    return score_pairs(pairs, bg, ctx, emit)
