"""Multimodal frame-sampling plumbing (1→N mapInPandas generator)."""

from __future__ import annotations

import hashlib

from ae_data_integration_spark.operators.multimodal import (
    attach_binary_payload,
    sample_frames,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE


def test_frame_sampling_explodes_and_matches_local(spark):
    d = table(spark, SF_SMOKE, "documents").limit(20)
    payload = attach_binary_payload(d, "text").select("doc_id", "content")
    frames = sample_frames(payload, n_frames=4).collect()
    assert len(frames) == 20 * 4
    rows = {(r["doc_id"], r["frame_idx"]): r for r in frames}
    for r in d.collect():
        b = r["text"].encode()
        n = len(b)
        for f in range(4):
            frame = b[(n * f) // 4 : (n * (f + 1)) // 4]
            got = rows[(r["doc_id"], f)]
            assert got["frame_md5"] == hashlib.md5(frame).hexdigest()
            assert got["frame_bytes"] == len(frame)


def test_nibble_histogram_matches_pure_python(spark):
    from ae_data_integration_spark.operators.multimodal import nibble_histogram

    d = table(spark, SF_SMOKE, "documents").limit(25)
    payload = attach_binary_payload(d, "text").select("doc_id", "content")
    got = {r["doc_id"]: r for r in nibble_histogram(payload).collect()}
    for r in d.collect():
        b = r["text"].encode()
        hist = [0] * 16
        for byte in b:
            hist[byte >> 4] += 1
        assert list(got[r["doc_id"]]["hist"]) == hist
        assert got[r["doc_id"]]["n_bytes"] == len(b)
