"""Round-12 surface: regression pins for the round-11 advisor
findings (ADVICE.md) and the r12 judge tasks — the compaction
tags-written/manifest-missing crash window, concurrent-writer
atomicity for the content-addressed artifact stores, and the
streaming lifecycle's stale-epoch sweep after a replay that re-homes
the source into fewer epochs."""

from __future__ import annotations

import glob
import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# --- compaction: the tags-written / manifest-missing window -------------------


def _pq_index(spark, tmp_path, monkeypatch):
    from ae_data_integration_spark.catalog import similarity_q as sq
    from ae_data_integration_spark.operators.ann_index import (
        append_to_pq_index,
        build_pq_index,
        index_dir,
    )
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    e = table(spark, SF_SMOKE, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    params = {"kind": "pq", "m": sq._S6_M, "k": sq._S6_K, "salt": "pqi",
              "train": "mod5"}
    path = index_dir(base, "pq", params)
    build_pq_index(base, path, m=sq._S6_M, k=sq._S6_K, salt="pqi")
    append_to_pq_index(batch, path, tag="b1")
    return e, base, batch, path


def test_compaction_crash_after_tags_before_flip_serves_old_layout(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 #1: on a PRE-MANIFEST index, a crash in the window
    after _merged_tags.json lands but before the manifest flip used to
    send serving back to the glob fallback — which skipped the
    (merged-tagged) increments while base_v* stayed unreachable,
    silently dropping the appended vectors forever. The fix seeds the
    manifest with the CURRENT serve set before any other compaction
    state change, so the flip is the only behavior switch."""
    import ae_data_integration_spark.operators.ann_index as ai

    e, _, _, path = _pq_index(spark, tmp_path, monkeypatch)
    dirs0 = ai._code_dirs(path)
    assert [os.path.basename(d) for d in dirs0] == ["codes", "codes_b1"]

    real_write = ai._write_serveset

    def crash_on_flip(p, names):
        if any(n.startswith("base_v") for n in names):
            raise RuntimeError("simulated crash at the commit point")
        real_write(p, names)

    monkeypatch.setattr(ai, "_write_serveset", crash_on_flip)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ai.compact_pq_index(spark, path)
    monkeypatch.setattr(ai, "_write_serveset", real_write)

    # the crash window on disk: seeded manifest + merged base +
    # merged tags, flip never happened
    assert os.path.exists(os.path.join(path, "base_v0001"))
    assert ai._merged_tags(path) == ["b1"]
    with open(os.path.join(path, "_serveset.json")) as fh:
        assert json.load(fh) == ["codes", "codes_b1"]

    # serving still sees the FULL old layout — the increment's vectors
    # are not dropped despite the recorded merged tag
    assert ai._code_dirs(path) == dirs0
    union = spark.read.parquet(*ai._code_dirs(path))
    assert union.select("id").distinct().count() == e.count()

    # a retried compaction completes: increments are still referenced
    # by the seeded manifest, so it re-merges and flips for real
    assert ai.compact_pq_index(spark, path) == 1
    assert [os.path.basename(d) for d in ai._code_dirs(path)] == ["base_v0001"]
    union = spark.read.parquet(*ai._code_dirs(path))
    assert union.select("id").distinct().count() == union.count() == e.count()


# --- artifact stores: concurrent-writer atomicity ------------------------------


def test_build_once_racing_builders_one_artifact(tmp_path):
    """Two builders racing the same content-addressed path must
    produce exactly ONE published artifact (bit-identical whichever
    racer wins) and leave no tmp debris. The barrier forces both
    builds to fully complete before either attempts the rename — the
    worst-case interleaving."""
    from ae_data_integration_spark.operators.ann_index import _build_once

    target = str(tmp_path / "art")
    barrier = threading.Barrier(2)
    results, errors = [], []

    def build(p):
        os.makedirs(p)
        with open(os.path.join(p, "data.txt"), "w") as fh:
            fh.write("deterministic-content\n")
        with open(os.path.join(p, "_DONE"), "w") as fh:
            fh.write("ok\n")
        barrier.wait(timeout=30)

    def run():
        try:
            results.append(_build_once(target, build))
        except Exception as exc:  # noqa: BLE001 - assert below
            errors.append(exc)

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert not errors
    assert results == [target, target]
    assert os.path.exists(os.path.join(target, "_DONE"))
    with open(os.path.join(target, "data.txt")) as fh:
        assert fh.read() == "deterministic-content\n"
    # the loser's tmp dir was discarded; nothing else remains
    assert sorted(os.listdir(tmp_path)) == ["art"]


def test_build_once_sweeps_torn_legacy_dir(tmp_path):
    """A leftover partial dir WITHOUT a _DONE marker under the target
    name (a crashed pre-_build_once build) is swept and replaced by
    the fresh publish."""
    from ae_data_integration_spark.operators.ann_index import _build_once

    target = str(tmp_path / "art")
    os.makedirs(target)
    with open(os.path.join(target, "partial.txt"), "w") as fh:
        fh.write("torn\n")

    def build(p):
        os.makedirs(p)
        with open(os.path.join(p, "data.txt"), "w") as fh:
            fh.write("good\n")
        with open(os.path.join(p, "_DONE"), "w") as fh:
            fh.write("ok\n")

    assert _build_once(target, build) == target
    assert os.path.exists(os.path.join(target, "_DONE"))
    assert not os.path.exists(os.path.join(target, "partial.txt"))


def test_build_once_requires_done_marker(tmp_path):
    """A build that forgets the _DONE marker must fail loudly, never
    publish — the marker is what every reader checks."""
    from ae_data_integration_spark.operators.ann_index import _build_once

    target = str(tmp_path / "art")

    def bad_build(p):
        os.makedirs(p)

    with pytest.raises(RuntimeError, match="_DONE"):
        _build_once(target, bad_build)
    assert not os.path.exists(target)
    assert os.listdir(tmp_path) == []


def test_ensure_lm_concurrent_racers_single_artifact(
    spark, tmp_path, monkeypatch
):
    """The real ensure_lm under two concurrent sessions (threads
    sharing the JVM — the record_parity.py driver-sim/engine overlap
    shape): both must return the SAME path, the artifact must carry
    _DONE, and scoring against it must work. Build-to-tmp + atomic
    rename means partial parquet writes can never interleave under
    the published directory."""
    from ae_data_integration_spark.operators.lm import ensure_lm, lm_serve_scored
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    toks = table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), r"\s+").alias("t")
    )
    paths, errors = [], []

    def run():
        try:
            paths.append(
                ensure_lm(toks, "t", train_filter=(F.col("lang") == "en"),
                          v=16, salt="race")
            )
        except Exception as exc:  # noqa: BLE001 - assert below
            errors.append(exc)

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors
    assert len(set(paths)) == 1
    path = paths[0]
    assert os.path.exists(os.path.join(path, "_DONE"))
    # no abandoned tmp build dirs beside the artifact
    assert not glob.glob(f"{path}.build-*")
    scored = lm_serve_scored(toks, path, "t")
    assert scored.count() == toks.count()


# --- shingles: linear char-array construction ----------------------------------


def test_char_array_shingles_bit_identical_to_substr_form(spark):
    """The O(len) two-step shingle construction (char_array +
    shingles_from_chars — the zipf doc-length straggler fix,
    SCALE_SPOT_r12 doc_skew_phase_isolation) must be BIT-IDENTICAL to
    the substr form on real docs and on the adversarial short-string
    edge cases (empty, < k, == k, repeats, internal whitespace) —
    including element ORDER, which the minhash and verify paths both
    consume."""
    from ae_data_integration_spark.functions.hashing import (
        char_array,
        shingles,
        shingles_from_chars,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(10**9, ""), (10**9 + 1, "ab"), (10**9 + 2, "abcde"),
         (10**9 + 3, "abcdef"), (10**9 + 4, "aaaaaaa"),
         (10**9 + 5, "a b  c\td")],
        "doc_id long, text string",
    )
    d = d.unionByName(extra)
    old = d.select("doc_id", shingles("text", 5).alias("s"))
    new = d.select("doc_id", char_array("text").alias("_ch")).select(
        "doc_id", shingles_from_chars("_ch", 5).alias("s")
    )
    assert old.exceptAll(new).count() + new.exceptAll(old).count() == 0


# --- kn: the forced keyed-join gram-table attach -------------------------------


def test_t25k_forced_keyed_plan_attaches_grams_without_broadcast(
    spark, tmp_path, monkeypatch
):
    """The written-but-never-run branch r11 flagged: with
    bcast_max_bytes=0, EVERY gram/context attach must be a merge-
    hinted keyed join — zero BroadcastHashJoin in the scoring plan
    (the 1-row t1 scalar still crosses via a broadcast nested loop,
    which is not a hash-join of a gram table). Value equality with
    the broadcast plan is proven separately by the shared t25 oracle
    (t25k parity) — this pins the PHYSICAL strategy."""
    from ae_data_integration_spark.operators.lm import (
        ensure_kn_lm,
        kn_serve_scored,
    )
    from ae_data_integration_spark.plans.explain import plan_asserts
    from ae_data_integration_spark.tables import table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    toks = table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), r"\s+").alias("t")
    )
    path = ensure_kn_lm(
        toks, "t", train_filter=(F.col("lang") == "en"), v=16, salt="t25k"
    )
    keyed = kn_serve_scored(toks, path, "t", bcast_max_bytes=0)
    plan = plan_asserts(keyed).plan
    assert "BroadcastHashJoin" not in plan
    assert plan.count("SortMergeJoin") >= 9  # 5 gram + 4 context attaches
    # and the default path on the same artifact still broadcasts
    bcast = kn_serve_scored(toks, path, "t")
    assert "SortMergeJoin" not in plan_asserts(bcast).plan
    # both plans score to identical rows (the oracle proves this at
    # parity scale; pin it here at smoke scale too)
    a = sorted(map(tuple, keyed.collect()))
    b = sorted(map(tuple, bcast.collect()))
    assert a == b


# --- streaming lifecycle: stale-epoch sweep ------------------------------------


def _lifecycle_fixture(spark, tmp_path, monkeypatch):
    from ae_data_integration_spark.catalog.lifecycle_q import _P9_SALT
    from ae_data_integration_spark.operators.ann_index import (
        build_pq_index,
        index_dir,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    base_e = e.filter(F.col("vec_id") % 5 != 0)
    p = index_dir(base_e, "pq", {"salt": _P9_SALT, "leg": "sweep"})
    build_pq_index(base_e, p, m=8, k=32, salt=_P9_SALT)
    src = str(tmp_path / "doc_src")
    batch.repartition(4).write.mode("overwrite").parquet(src)
    return d, e, corpus, batch, base_e, p, src


def test_lifecycle_replay_with_fewer_epochs_sweeps_stale_artifacts(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 #3: a replay after TOTAL checkpoint loss whose
    reader batches the source into FEWER epochs (maxFilesPerTrigger
    dropped) re-homes every doc into low epoch ids; the original
    drain's higher-numbered accepted/drops dirs and codes_b*
    increments are stale and must be SWEPT, or the post-drain unions
    and the served index double-count those docs."""
    from ae_data_integration_spark.operators.ann_index import _code_dirs
    from ae_data_integration_spark.streaming.lifecycle import (
        ingest_stream_to_lifecycle,
    )

    d, e, corpus, batch, base_e, p, src = _lifecycle_fixture(
        spark, tmp_path, monkeypatch
    )
    out = str(tmp_path / "out")

    def drain(ckpt, max_files):
        r = spark.readStream.schema(d.schema)
        if max_files:
            r = r.option("maxFilesPerTrigger", 1)
        ingest_stream_to_lifecycle(
            r.parquet(src), corpus, e, out, p,
            query_name="t_lc_sweep", checkpoint_dir=ckpt,
        )

    # original run: one epoch per file (4 epochs)
    drain(str(tmp_path / "ckpt1"), max_files=True)
    n1 = len(glob.glob(f"{out}/accepted/b*"))
    assert n1 >= 2
    acc_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/accepted/b*").collect()
    )

    # checkpoint lost; replay batches ALL files into epoch 0
    drain(str(tmp_path / "ckpt2"), max_files=False)
    # stale epoch dirs above the replay's max epoch are gone
    assert glob.glob(f"{out}/accepted/b*") == [f"{out}/accepted/b0"]
    assert glob.glob(f"{out}/drops/b*") == [f"{out}/drops/b0"]
    assert [os.path.basename(x) for x in _code_dirs(p)] == [
        "codes", "codes_b0"
    ]
    # and the surviving epoch-0 artifacts carry the WHOLE batch:
    # unions identical to the original drain, index still exact
    acc_ids2 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/accepted/b*").collect()
    )
    assert acc_ids2 == acc_ids
    union = spark.read.parquet(*_code_dirs(p))
    n_expected = base_e.count() + len(acc_ids)
    assert union.count() == n_expected
    assert union.select("id").distinct().count() == n_expected


def test_lifecycle_sweep_raises_when_stale_tag_was_compacted(
    spark, tmp_path, monkeypatch
):
    """A stale epoch tag already folded into the index base cannot be
    unmerged — compact-then-lose-checkpoint-then-replay-smaller must
    raise loudly (rebuild required), never silently serve duplicated
    vectors."""
    from ae_data_integration_spark.operators.ann_index import compact_pq_index
    from ae_data_integration_spark.streaming.lifecycle import (
        ingest_stream_to_lifecycle,
    )

    d, e, corpus, batch, base_e, p, src = _lifecycle_fixture(
        spark, tmp_path, monkeypatch
    )
    out = str(tmp_path / "out")

    def drain(ckpt, max_files):
        r = spark.readStream.schema(d.schema)
        if max_files:
            r = r.option("maxFilesPerTrigger", 1)
        ingest_stream_to_lifecycle(
            r.parquet(src), corpus, e, out, p,
            query_name="t_lc_sweep2", checkpoint_dir=ckpt,
        )

    drain(str(tmp_path / "ckpt1"), max_files=True)
    assert compact_pq_index(spark, p) >= 2  # folds the epoch increments
    with pytest.raises(RuntimeError, match="rebuild"):
        drain(str(tmp_path / "ckpt2"), max_files=False)


# --- exact-substring span dedup (d8 / pipe10) -------------------------------


def _span_docs(spark):
    # A/B share one 40-char interior block (with L=32 that is a real
    # PARTIAL span, not a whole-doc dup); C repeats a 32-char block
    # twice INSIDE itself; D is unique. Blocks are APERIODIC (a char
    # run like 'x'*40 repeats within itself, so every window shares
    # one fp and the canonical doc gets flagged too — correct
    # ExactSubstr semantics, but not the case under test).
    # Fillers are md5-chain strings so no two docs share ANY >=32-char
    # filler substring (digit-run fillers like f"a{i:07d}" leak shared
    # "0000009" tails into the windows abutting the block).
    import hashlib

    def fill(seed, n):
        s = ""
        j = 0
        while len(s) < n:
            s += hashlib.md5(f"{seed}:{j}".encode()).hexdigest()
            j += 1
        return s[:n]

    block = "".join(f"X{i:03d}" for i in range(10))
    rep = "".join(f"Y{i:03d}" for i in range(8))
    a = fill("a", 80) + block + fill("b", 80)
    b = fill("c", 80) + block + fill("d", 80)
    c = rep + fill("e", 48) + rep
    d = fill("f", 96)
    return spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], ["doc_id", "text"]
    )


def test_substring_spans_partial_and_intra_doc(spark):
    from ae_data_integration_spark.operators.dedup import (
        substring_duplicate_spans,
    )

    docs = _span_docs(spark)
    rows = {
        (r.doc_id, r.span_start, r.span_end)
        for r in substring_duplicate_spans(docs, min_len=32).collect()
    }
    # Doc 1 owns the canonical occurrence of the shared block -> no
    # span; doc 2's flagged windows are exactly the 9 positions of
    # the 40-char block (pos 81..89 -> chars 81..120). Doc 3's second
    # rep occurrence is the single window at pos 81 (chars 81..112).
    assert rows == {(2, 81, 120), (3, 81, 112)}


def test_substring_spans_island_merge_and_short_docs(spark):
    from ae_data_integration_spark.operators.dedup import (
        substring_duplicate_spans,
    )

    # Two shared blocks separated by a 5-char unique gap in the copy:
    # flagged windows are adjacent-ish but the gap < L keeps every
    # intermediate window unshared -> two islands MERGE only if the
    # flagged positions are within L of each other. Here pos runs are
    # 1..9 and 54..62 (gap 45 < 64... use L=32: gap 45 > 32 -> two
    # distinct spans). Shorter-than-L docs produce no windows at all.
    blk1 = "".join(f"P{i:03d}" for i in range(10))
    blk2 = "".join(f"Q{i:03d}" for i in range(10))
    orig = blk1 + "".join(f"g{i:03d}" for i in range(10)) + blk2
    copy = blk1 + "=" * 5 + blk2
    docs = spark.createDataFrame(
        [(1, orig), (2, copy), (3, "tiny")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in substring_duplicate_spans(docs, min_len=32).collect()
    }
    # copy: blk1 windows at pos 1..9 -> span 1..40; blk2 windows at
    # pos 46..54 -> span 46..85. 46 - 9 = 37 > 32 -> NOT merged.
    assert got == {(2, 1, 40, 40), (2, 46, 85, 40)}


def test_scrub_rebuilds_complement_exactly(spark):
    from pyspark.sql import functions as F
    from ae_data_integration_spark.operators.dedup import (
        scrub_duplicate_spans,
        substring_duplicate_spans,
    )

    docs = _span_docs(spark)
    spans = substring_duplicate_spans(docs, min_len=32)
    out = {r.doc_id: r for r in scrub_duplicate_spans(docs, spans).collect()}
    # Only span-bearing docs appear; removed + |clean| == orig_len.
    assert set(out) == {2, 3}
    texts = {r.doc_id: r.text for r in docs.collect()}
    import hashlib

    b_clean = texts[2][:80] + texts[2][120:]
    c_clean = texts[3][:80] + texts[3][112:]
    for did, clean in ((2, b_clean), (3, c_clean)):
        r = out[did]
        assert r.orig_len == len(texts[did])
        assert r.removed_chars == len(texts[did]) - len(clean)
        assert r.clean_fp == hashlib.md5(clean.encode()).hexdigest()


# --- s11 / samp5 plan + quota properties ------------------------------------


def test_s11_filter_pushed_below_broadcast_probe(spark):
    """The label predicate must reach the candidate parquet scan
    (pre-filtering), not run above the distance computation."""
    from ae_data_integration_spark.catalog import load_all, resolve
    from ae_data_integration_spark.plans.explain import plan_asserts
    from tests.conftest import SF_CORRECT

    reg = load_all()
    df = reg[resolve("s11_filtered_ann")].fn(spark, SF_CORRECT)
    (
        plan_asserts(df)
        .has_pushed_filter("label")
        .has_broadcast_exchange(1)
        .no_python_row_udf()
    )


def test_samp5_quotas_exact_and_capped(spark):
    """Quota arithmetic is exact integer math after the Q30 grid:
    replay it in plain Python from the per-source counts and compare;
    every per-source take is exactly min(quota, n_docs)."""
    import math
    from collections import Counter

    from ae_data_integration_spark.catalog import load_all, resolve
    from ae_data_integration_spark.tables import table as _table
    from tests.conftest import SF_CORRECT

    reg = load_all()
    sel = reg[resolve("samp5_temperature_mixture")].fn(spark, SF_CORRECT)
    got = Counter(r.source for r in sel.collect())
    docs = _table(spark, SF_CORRECT, "documents").groupBy("source").count()
    n = {r.source: r["count"] for r in docs.collect()}
    total = sum(n.values())
    # fpsum normalizer: fixed-point Q30 sum of sqrt counts
    z = sum(round(math.sqrt(v) * (1 << 30)) for v in n.values()) / (1 << 30)
    t = total * 2 // 5
    for s, v in n.items():
        share = round(math.sqrt(v) / z * (1 << 30))
        assert got[s] == min((t * share) >> 30, v)


def test_substring_windows_segmented_matches_bruteforce(spark):
    """The two-level segment construction must emit exactly the
    stride-1 window set of the naive definition — positions spanning
    segment boundaries (512, 1024, ...) included, each exactly once.
    Doc lengths straddle the boundary arithmetic: 63 (none), 64 (one
    window), 575/576/577 (one vs two segments), 2000 (four)."""
    import hashlib

    from ae_data_integration_spark.operators.dedup import substring_windows

    def fill(seed, n):
        s = ""
        j = 0
        while len(s) < n:
            s += hashlib.md5(f"{seed}:{j}".encode()).hexdigest()
            j += 1
        return s[:n]

    docs = [(i, fill(f"doc{i}", n)) for i, n in
            enumerate((63, 64, 575, 576, 577, 2000))]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.key, r.pos): r.fp for r in substring_windows(df).collect()}
    want = {
        (i, p + 1): hashlib.md5(t[p:p + 64].encode()).hexdigest()
        for i, t in docs for p in range(max(len(t) - 63, 0))
    }
    assert got == want


def test_incremental_span_flags_corpus_always_canonical(spark):
    """The ingestion rule: a batch doc sharing a block with the
    corpus is scrubbed EVEN IF its doc_id is smaller than the corpus
    owner's — ingestion order outranks doc_id (deliberate divergence
    from d8's global election, where the smallest (doc, pos) wins).
    Batch-internal repeats still keep their batch-canonical copy."""
    import hashlib

    from ae_data_integration_spark.operators.dedup import (
        incremental_span_flags,
        merge_window_islands,
        substring_windows,
    )

    def fill(seed, n):
        s = ""
        j = 0
        while len(s) < n:
            s += hashlib.md5(f"{seed}:{j}".encode()).hexdigest()
            j += 1
        return s[:n]

    block = "".join(f"Z{i:03d}" for i in range(10))  # 40 chars aperiodic
    # corpus doc 100 owns the block; batch doc 1 (SMALLER id) repeats
    # it; batch docs 2 and 3 share a batch-only block (doc 2 is
    # batch-canonical, doc 3 scrubbed).
    bblock = "".join(f"W{i:03d}" for i in range(10))
    corpus = spark.createDataFrame(
        [(100, fill("c", 40) + block + fill("c2", 40))], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (1, fill("a", 40) + block + fill("a2", 40)),
            (2, fill("b", 40) + bblock + fill("b2", 40)),
            (3, fill("d", 40) + bblock + fill("d2", 40)),
        ],
        ["doc_id", "text"],
    )
    cfp = substring_windows(corpus, min_len=32).select("fp").distinct()
    flagged = incremental_span_flags(batch, cfp, min_len=32)
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in merge_window_islands(flagged, min_len=32).collect()
    }
    assert spans == {(1, 41, 80), (3, 41, 80)}
