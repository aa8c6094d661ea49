#!/usr/bin/env python3
"""Measure the incremental-append claim: appending a FIXED 1000-vector
batch to a PQ index costs the same regardless of corpus size (work ∝
batch — encode under the frozen broadcast codebook, one increment
write; no corpus re-scan, no retraining).

Protocol: per corpus scale, build the base index (corpus minus the
fixed batch, wall recorded separately — the once-per-index term),
then time append_to_pq_index alone (min of 3; overwrite-per-tag makes
reruns idempotent). A serve is timed once for context: serving DOES
grow with the corpus (the scanned-index term), append must not.

Merges an "append_scaling" section into SCALE_SPOT_r{N}.json (the
spot-leg record's merge discipline). Usage:
    python scripts/measure_append.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEGS = {
    "1x": "/root/testdata/sf0.1",
    "10x": os.path.join(REPO, ".benchdata", "sf1"),
    "100x": os.path.join(REPO, ".benchdata", "sf10"),
    "1000x": os.path.join(REPO, ".benchdata", "sf100"),
}
BATCH_N = 1000


def main() -> int:
    from pyspark.sql import functions as F

    from ae_data_integration_spark.operators.ann_index import (
        _done,
        append_to_pq_index,
        build_pq_index,
        index_dir,
        pq_serve_topk,
    )
    from ae_data_integration_spark.session import get_spark
    from ae_data_integration_spark.tables import table

    spark = get_spark("measure-append")
    out: dict = {}
    for leg, d in LEGS.items():
        if not os.path.isdir(d):
            out[leg] = {"skipped": f"missing {d}"}
            continue
        e = table(spark, d, "embeddings")
        n = e.count()
        base = e.filter(F.col("vec_id") >= BATCH_N)
        batch = e.filter(F.col("vec_id") < BATCH_N)
        params = {"kind": "pq", "m": 8, "k": 32, "salt": "pqapp",
                  "base": f"ge{BATCH_N}"}
        path = index_dir(base, "pq", params)
        t0 = time.time()
        if not _done(path):
            build_pq_index(base, path, m=8, k=32, salt="pqapp")
        build_wall = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            append_to_pq_index(batch, path, tag="fixed1k")
            best = min(best, time.time() - t0)
            # drop the folded-tag shortcut potential: tag never merges
        t0 = time.time()
        q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
        pq_serve_topk(e, q, path, m=8, k=32, refine=60, topk=10).collect()
        serve_wall = time.time() - t0
        out[leg] = {
            "corpus_n": n,
            "batch_n": BATCH_N,
            "build_wall_sec": round(build_wall, 1),
            "append_wall_sec": round(best, 2),
            "serve_wall_sec": round(serve_wall, 1),
        }
        print(leg, json.dumps(out[leg]), flush=True)
        spark.catalog.clearCache()

    rounds = [
        int(p.split("_r")[-1].split(".")[0])
        for p in os.listdir(REPO) if p.startswith("BENCH_r")
    ]
    npath = os.path.join(
        REPO, f"SCALE_SPOT_r{(max(rounds) if rounds else 0) + 1:02d}.json"
    )
    rec = {}
    if os.path.exists(npath):
        with open(npath) as fh:
            rec = json.load(fh)
    rec["append_scaling"] = {
        "protocol": "fixed 1000-vector batch appended to a base index of "
                    "growing corpus size; append = min of 3 (idempotent "
                    "overwrite), build and one serve recorded for context",
        "legs": out,
    }
    with open(npath, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", npath)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
