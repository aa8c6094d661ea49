"""Persisted ANN indexes: build once per corpus, serve per query.

The all-in-one operators (similarity.pq_adc_rerank /
ivfpq_adc_rerank) retrain codebooks and re-encode the corpus inside
every query — right for an oracle that replays the whole pipeline,
wrong as the deployed shape: at 100 TB, codebook training + encoding
is a once-per-index batch job, and the serving path touches only
(a) the model-sized artifacts (codebooks, coarse centroids — one
broadcast each) and (b) the code table scan (m small ints per vector,
a 32-64x byte reduction over the raw float64 vectors). This module is
that split (faiss trains an Index once and serves many searches; same
lifecycle as operators/artifacts.py's state-dict⇄parquet models):

* ``build_pq_index`` / ``build_ivfpq_index`` — train the (md5-seeded,
  fixed-point, bit-deterministic) quantizers via the SAME kernels the
  all-in-one operators use (similarity._pq_train_encode, kmeans_fit)
  and write the artifacts as plain parquet tables:
      pq:    codebook(ss, cluster, centroid)   [model-sized]
             codes(id, codes array<long>)      [written distributed]
      ivfpq: cents(cell, centroid)             [model-sized]
             codebook(ss, cluster, centroid)   [model-sized]
             codes(id, cell, codes)            [written distributed]
  plus a meta.json (params + dataset fingerprint) and a _DONE marker
  written LAST, so a crashed build is re-run, never served.
* ``pq_serve_topk`` / ``ivfpq_serve_topk`` — scan the artifacts back
  and run only the query half (similarity._pq_serve/_ivfpq_serve:
  ADC LUTs -> integer scan -> exact rerank).
* ``ensure_*_index`` — content-addressed cache: the index directory
  is keyed by (params, dataset fingerprint = each parquet file's
  path+size+mtime), so a regenerated dataset or changed parameters
  build a NEW index instead of serving a stale one.

Because training is deterministic and parquet round-trips doubles and
longs bit-for-bit, serve-from-artifact returns EXACTLY what the
all-in-one operator returns — the catalog registers the serve path
(s6q/s7q) under the same DuckDB oracle that replays build+serve, and
the value hash proves the stored artifact equals the replayed one.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import to_double
from ae_data_integration_spark.functions.caching import persist_tracked
from ae_data_integration_spark.operators.similarity import (
    _ivfpq_serve,
    _pq_serve,
    _pq_train_encode,
    _vec_dim,
    _widen,
)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dataset_fingerprint(df: DataFrame) -> str:
    """Content key for the index cache: md5 over each input file's
    (path, size, mtime) — the _DIM_CACHE discipline. A dataset
    regenerated in place must not be served a stale index."""
    try:
        files = sorted(df.inputFiles())
    except Exception:  # noqa: BLE001 - planless inputs get no cache
        files = []
    parts = []
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri
        try:
            st = os.stat(path)
            parts.append(f"{uri}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(uri)
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]


def index_dir(emb: DataFrame, kind: str, params: dict) -> str:
    base = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR", os.path.join(_REPO, ".artifacts", "ann")
    )
    pkey = hashlib.md5(
        json.dumps(params, sort_keys=True).encode()
    ).hexdigest()[:12]
    return os.path.join(base, f"{kind}_{pkey}_{_dataset_fingerprint(emb)}")


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_DONE"))


def _build_once(path: str, build_fn) -> str:
    """Concurrent-writer discipline for the content-addressed artifact
    stores (PQ/IVF-PQ indexes, bigram/KN LMs): build into a PRIVATE
    tmp dir, then publish with ONE atomic ``os.rename`` — the
    ``_serveset.json`` tmp+rename discipline generalized to whole
    artifacts.

    Two sessions racing ``if not _done(path): build(path)`` would
    interleave partial parquet writes under the same directory (the
    driver-sim and engine parity sessions already run concurrently);
    here each racer builds its own ``<path>.build-<pid>-<rand>`` and
    the first rename wins. Because every build is deterministic and
    the dir is content-addressed, the loser's artifact is
    bit-identical — it just gets discarded. A leftover dir WITHOUT a
    ``_DONE`` marker under the target name (a crashed legacy build)
    is swept and the rename retried; losing that retry is fine iff
    the winner finished (``_done``).
    """
    import shutil
    import uuid

    if _done(path):
        return path
    tmp = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    build_fn(tmp)
    if not _done(tmp):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(f"artifact build for {path} left no _DONE marker")
    try:
        os.rename(tmp, path)
    except OSError:
        if _done(path):  # lost the race to an identical artifact
            shutil.rmtree(tmp, ignore_errors=True)
            return path
        # target occupied by a torn legacy build: sweep, retry once
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:
            if not _done(path):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def _finish(path: str, params: dict) -> None:
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(params, fh, indent=1, sort_keys=True)
    with open(os.path.join(path, "_DONE"), "w") as fh:
        fh.write("ok\n")


def build_pq_index(
    emb: DataFrame,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 32,
    salt: str = "pq",
) -> None:
    """Train PQ codebooks + encode the corpus; write the index to
    `path`. The codes table is written DISTRIBUTED (one shuffle-free
    map stage after the assignment window) — at 100 TB it is the only
    large output and never visits the driver."""
    d = _vec_dim(emb, vec_col)
    if d is None or d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    pts = persist_tracked(
        _widen(emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("v")))
    )
    cb1, codes = _pq_train_encode(pts, m=m, k=k, ds=d // m, salt=salt)
    cb1.write.mode("overwrite").parquet(os.path.join(path, "codebook"))
    codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    _finish(path, {"kind": "pq", "m": m, "k": k, "d": d, "salt": salt})


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k_coarse: int = 8,
    m: int = 8,
    k: int = 32,
    salt: str = "ivfpq",
) -> None:
    """Coarse quantizer + residual PQ codebooks + per-vector (cell,
    codes); write the index to `path`."""
    from ae_data_integration_spark.operators.kmeans import kmeans_fit

    d = _vec_dim(emb, vec_col)
    if d is None or d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    assigned, cents = kmeans_fit(
        emb, key_col, vec_col, k=k_coarse, n_iter=1, salt=salt
    )
    res = persist_tracked(
        _widen(assigned.select("id", "vec", F.col("cluster").alias("cell")))
        .join(F.broadcast(cents.withColumnRenamed("cluster", "cell")), "cell")
        .select(
            "id", "cell",
            F.zip_with("vec", "centroid", lambda a, b: a - b).alias("v"),
        )
    )
    cb1, codes = _pq_train_encode(
        res.select("id", "v"), m=m, k=k, ds=d // m, salt=salt + "c"
    )
    cents.withColumnRenamed("cluster", "cell").write.mode("overwrite").parquet(
        os.path.join(path, "cents")
    )
    cb1.write.mode("overwrite").parquet(os.path.join(path, "codebook"))
    codes.join(res.select("id", "cell"), "id").write.mode("overwrite").parquet(
        os.path.join(path, "codes")
    )
    _finish(
        path,
        {"kind": "ivfpq", "k_coarse": k_coarse, "m": m, "k": k, "d": d,
         "salt": salt},
    )


def ensure_pq_index(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 32,
    salt: str = "pq",
) -> str:
    params = {"kind": "pq", "m": m, "k": k, "salt": salt}
    path = index_dir(emb, "pq", params)
    return _build_once(
        path,
        lambda p: build_pq_index(emb, p, key_col, vec_col, m=m, k=k, salt=salt),
    )


def ensure_ivfpq_index(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k_coarse: int = 8,
    m: int = 8,
    k: int = 32,
    salt: str = "ivfpq",
) -> str:
    params = {"kind": "ivfpq", "k_coarse": k_coarse, "m": m, "k": k, "salt": salt}
    path = index_dir(emb, "ivfpq", params)
    return _build_once(
        path,
        lambda p: build_ivfpq_index(
            emb, p, key_col, vec_col, k_coarse=k_coarse, m=m, k=k, salt=salt
        ),
    )


def pq_serve_topk(
    emb: DataFrame,
    queries: DataFrame,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 32,
    refine: int = 60,
    topk: int = 10,
) -> DataFrame:
    """PQ-ADC search against a PERSISTED index: the plan reads the
    model-sized codebook (broadcast), scans the codes table (m small
    ints per vector — the production memory-bandwidth shape), and
    touches original vectors only for the Q rows of LUT input and the
    Q*refine rerank rows. No training term anywhere in the plan."""
    spark = emb.sparkSession
    d = _vec_dim(emb, vec_col)
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    # "codes" plus any "codes_<tag>" increments written by
    # append_to_pq_index — the served index is their union.
    codes = _widen(spark.read.parquet(*_code_dirs(path)))
    pts = persist_tracked(
        emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("v"))
    )
    q_ids = queries.select(F.col(key_col).alias("q_id"))
    return _pq_serve(
        pts, cb1, codes, q_ids, m=m, k=k, ds=d // m, d=d,
        refine=refine, topk=topk,
    )


def ivfpq_serve_topk(
    emb: DataFrame,
    queries: DataFrame,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 32,
    nprobe: int = 4,
    refine: int = 120,
    topk: int = 10,
) -> DataFrame:
    """IVF-PQ search against a PERSISTED index: broadcast the coarse
    centroids + residual codebooks, scan only the (cell, codes) table
    restricted to probed cells, exact-rerank Q*refine rows."""
    spark = emb.sparkSession
    d = _vec_dim(emb, vec_col)
    cents = spark.read.parquet(os.path.join(path, "cents"))
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    # base codes plus any append_to_ivfpq_index increments
    coded = _widen(spark.read.parquet(*_code_dirs(path)))
    pts = persist_tracked(
        emb.select(F.col(key_col).alias("id"), to_double(vec_col).alias("vec"))
    )
    q_ids = queries.select(F.col(key_col).alias("q_id"))
    return _ivfpq_serve(
        pts, cents, cb1, coded, q_ids, m=m, k=k, ds=d // m, d=d,
        nprobe=nprobe, refine=refine, topk=topk,
    )


def _code_dirs(path: str) -> list[str]:
    """The served set of code tables — manifest-driven once a manifest
    exists, glob-derived before one does.

    The manifest (``_serveset.json``, updated only by atomic rename)
    makes the served set EXPLICIT: after a compaction it names the
    versioned merged table (``base_v<n>``, a name the glob never
    matches), so a crash anywhere in compaction's cleanup phase can
    only leave unreferenced garbage dirs, never serve a partial or
    duplicated union. The pre-manifest glob fallback keeps the two
    crash holes closed too: a ``codes_<tag>`` increment whose tag is
    already in ``_merged_tags.json`` is skipped (it was folded into
    the base; scanning both would duplicate rows), and increments
    alongside a MISSING base ``codes`` dir fail loudly instead of
    silently serving increments-only results."""
    import glob as _glob

    manifest = os.path.join(path, "_serveset.json")
    if os.path.exists(manifest):
        with open(manifest) as fh:
            names = json.load(fh)
        dirs = [os.path.join(path, n) for n in sorted(names)]
        missing = [d for d in dirs if not os.path.isdir(d)]
        if missing:
            raise FileNotFoundError(
                f"index serve-set manifest references missing dirs: {missing}"
            )
        return dirs
    merged = set(_merged_tags(path))
    dirs = sorted(
        d
        for d in _glob.glob(os.path.join(path, "codes*"))
        if os.path.isdir(d)
        and not (
            os.path.basename(d).startswith("codes_")
            and os.path.basename(d)[len("codes_"):] in merged
        )
    )
    base = os.path.join(path, "codes")
    if dirs and base not in dirs:
        raise FileNotFoundError(
            f"index at {path} has increments but no base 'codes' table — "
            "torn compaction; rebuild or restore the manifest"
        )
    return dirs


def _write_serveset(path: str, names: list[str]) -> None:
    """Atomically replace the serve-set manifest (tmp + rename)."""
    manifest = os.path.join(path, "_serveset.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(names), fh)
    os.replace(tmp, manifest)


def _register_increment(path: str, name: str) -> None:
    """Add an increment dir to the manifest, if one exists (append
    runs AFTER the increment's parquet write, so the manifest never
    references a dir that is not fully on disk)."""
    manifest = os.path.join(path, "_serveset.json")
    if not os.path.exists(manifest):
        return
    with open(manifest) as fh:
        names = json.load(fh)
    if name not in names:
        _write_serveset(path, [*names, name])


def remove_increment(path: str, name: str) -> None:
    """Drop an increment from the served set and from disk: manifest
    flip first (atomic rename), then rmtree — a crash in between
    leaves only an unreferenced garbage dir that the next compaction
    sweeps. Used by the streaming lifecycle's stale-epoch sweep
    (a replay after checkpoint loss that re-homes docs into FEWER
    epochs must retire the higher-numbered increments the original
    run wrote)."""
    import shutil

    manifest = os.path.join(path, "_serveset.json")
    if os.path.exists(manifest):
        with open(manifest) as fh:
            names = json.load(fh)
        if name in names:
            _write_serveset(path, [n for n in names if n != name])
    shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def append_to_pq_index(
    emb_batch: DataFrame,
    path: str,
    tag: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add a NEW batch of vectors to an existing PQ index — the faiss
    ``add()`` pattern: the batch is encoded under the index's FROZEN
    codebooks (read from the artifact, broadcast) and its codes land
    in a separate ``codes_<tag>`` parquet directory that serving
    unions with the base table.

    Work ∝ batch (the incremental-ingest discipline of
    pipe5_incremental_dedup, applied to the ANN family): no
    retraining, no rewrite of existing codes, no corpus re-scan.
    mode="overwrite" per tag makes re-appending the same batch
    idempotent — a retried ingest job cannot duplicate codes — and a
    tag that compact_pq_index has already folded into the base table
    is a recorded no-op (``_merged_tags.json``), so compact-then-
    retry cannot duplicate either. The codebook staleness trade is
    the standard one: recall degrades as the appended distribution
    drifts from the training corpus; retrain (a fresh
    content-addressed build) when it does.
    """
    from ae_data_integration_spark.operators.similarity import _pq_encode

    if tag in _merged_tags(path):
        return  # already folded into the base codes table
    spark = emb_batch.sparkSession
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    m, d = int(meta["m"]), int(meta["d"])
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    pts = _widen(
        emb_batch.select(
            F.col(key_col).alias("id"), to_double(vec_col).alias("v")
        )
    )
    _pq_encode(pts, cb1, m, d // m).write.mode("overwrite").parquet(
        os.path.join(path, f"codes_{tag}")
    )
    _register_increment(path, f"codes_{tag}")


def compact_pq_index(spark, path: str) -> int:
    """Merge every ``codes_<tag>`` increment back into the base
    ``codes`` table — the maintenance job a long-lived incremental
    index runs when the increment count starts to hurt scan planning
    (many small parquet directories = many splits + listing overhead).

    Semantics-free by construction: serving scans the UNION of code
    dirs, so rewriting that union as one table changes nothing the
    query sees (tested by frame equality in tests). Crash-safe by a
    single atomic commit point: a PRE-MANIFEST index is first given a
    manifest naming its CURRENT serve set (so from here on the
    manifest — updated only by atomic rename — is the ONLY thing that
    decides what serves, and no intermediate file write can shift the
    served set), then the merged union is written to a NEW versioned
    dir (``base_v<n>``), folded tags are recorded in
    ``_merged_tags.json``, and then ONE ``os.replace`` of the
    manifest flips serving from {old set} to {base_v<n>}. A crash
    anywhere before the flip serves the old layout fully intact
    (``_merged_tags.json`` timing is harmless: with a manifest
    present, serving never consults the tags); a crash after the flip
    serves exactly the merged table (cleanup of the now-unreferenced
    old dirs is the only deferred work, re-done harmlessly by the
    next compaction). Recording folded tags makes append_to_pq_index
    treat a compact-then-retry of the same tag as a no-op instead of
    re-introducing (and duplicating) the batch. Returns the number of
    increments merged.
    """
    import glob as _glob
    import shutil

    dirs = _code_dirs(path)
    if os.path.exists(os.path.join(path, "_serveset.json")):
        # sweep dirs a previous compaction unreferenced but crashed
        # before deleting (compaction is a single-driver maintenance
        # job — no concurrent appends by contract, same as rmtree in
        # the cleanup phase below)
        referenced = set(dirs)
        for d in _glob.glob(os.path.join(path, "codes*")) + _glob.glob(
            os.path.join(path, "base_v*")
        ):
            if os.path.isdir(d) and d not in referenced:
                shutil.rmtree(d, ignore_errors=True)
    incs = [d for d in dirs if not os.path.basename(d).startswith("base_v")
            and os.path.basename(d) != "codes"]
    if not incs:
        return 0
    if not os.path.exists(os.path.join(path, "_serveset.json")):
        # pre-manifest index: pin the CURRENT serve set before any
        # other state change. Without this, a crash in the window
        # after _merged_tags.json lands but before the manifest flip
        # would send serving back to the glob fallback, which skips
        # the (now merged-tagged) increments while the versioned base
        # is still unreachable — silently dropping those vectors.
        _write_serveset(path, [os.path.basename(d) for d in dirs])
    existing_v = [
        int(os.path.basename(d)[len("base_v"):])
        for d in dirs
        if os.path.basename(d).startswith("base_v")
    ]
    new_base = f"base_v{max(existing_v, default=0) + 1:04d}"
    spark.read.parquet(*dirs).write.mode("overwrite").parquet(
        os.path.join(path, new_base)
    )
    merged = sorted(
        set(_merged_tags(path))
        | {os.path.basename(d)[len("codes_"):] for d in incs}
    )
    with open(os.path.join(path, "_merged_tags.json"), "w") as fh:
        json.dump(merged, fh)
    _write_serveset(path, [new_base])  # the atomic commit point
    for d in dirs:  # now-unreferenced old base + increments
        shutil.rmtree(d, ignore_errors=True)
    return len(incs)


def _merged_tags(path: str) -> list[str]:
    p = os.path.join(path, "_merged_tags.json")
    if not os.path.exists(p):
        return []
    with open(p) as fh:
        return json.load(fh)


def append_to_ivfpq_index(
    emb_batch: DataFrame,
    path: str,
    tag: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-PQ twin of append_to_pq_index: the batch is assigned to
    its nearest FROZEN coarse cell, residualized against that cell's
    centroid, encoded under the FROZEN residual codebooks, and the
    (id, cell, codes) rows land in a ``codes_<tag>`` increment.
    Same guarantees: work ∝ batch, idempotent per tag, folded tags
    are no-ops (compact_pq_index is layout-generic and serves both
    index kinds)."""
    from ae_data_integration_spark.operators.kmeans import _assign
    from ae_data_integration_spark.operators.similarity import _pq_encode

    if tag in _merged_tags(path):
        return
    spark = emb_batch.sparkSession
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    m, d = int(meta["m"]), int(meta["d"])
    cents = spark.read.parquet(os.path.join(path, "cents"))
    cb1 = spark.read.parquet(os.path.join(path, "codebook"))
    pts = _widen(
        emb_batch.select(
            F.col(key_col).alias("id"), to_double(vec_col).alias("vec")
        )
    )
    assigned = _assign(pts, cents.withColumnRenamed("cell", "cluster"))
    res = (
        assigned.select("id", "vec", F.col("cluster").alias("cell"))
        .join(F.broadcast(cents), "cell")
        .select(
            "id", "cell",
            F.zip_with("vec", "centroid", lambda a, b: a - b).alias("v"),
        )
    )
    codes = _pq_encode(res.select("id", "v"), cb1, m, d // m)
    codes.join(res.select("id", "cell"), "id").write.mode("overwrite").parquet(
        os.path.join(path, f"codes_{tag}")
    )
    _register_increment(path, f"codes_{tag}")
