#!/usr/bin/env python3
"""Recall-after-append drift curve for the incremental PQ index
(round-11 task: the r10 verdict asked for the measured curve behind
the s6d trigger rule).

Protocol: build the PQ index on the 100x base corpus (embeddings with
vec_id % 5 != 0 from .benchdata/sf10, 160k vectors), then append the
20% batch with a FRACTION f of its vectors shifted out of the
training support (x -> x + 5.0 for md5-selected ids — deterministic).
For each f, serve the standard 20-probe set against base ∪ appended
and score recall@10 against exact brute force over the SAME corpus;
also record the s6d residual-energy ratio (appended/base). The curve
shows recall decaying with drifted fraction while serve wall stays
flat — and that the residual ratio crosses the 1.5 rebuild trigger
exactly where recall damage becomes material, which is what makes the
trigger actionable without ground truth.

Merges results into SCALE_SPOT_r{N}.json under "index_drift_study".
Usage: python scripts/measure_index_drift.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRACTIONS = (0.0, 0.25, 0.5, 1.0)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf10"
    )
    os.environ.setdefault(
        "SPARK_GRAFT_INDEX_DIR", os.path.join(REPO, ".benchdata", "drift_ann")
    )
    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog.similarity_q import (
        _S6_K,
        _S6_M,
        _S6_REFINE,
        _S6_TOPK,
        pq_residual_report,
    )
    from ae_data_integration_spark.operators.ann_index import (
        _done,
        append_to_pq_index,
        build_pq_index,
        index_dir,
        pq_serve_topk,
    )
    from ae_data_integration_spark.operators.similarity import brute_force_topk
    from ae_data_integration_spark.session import get_spark
    from ae_data_integration_spark.tables import table

    spark = get_spark("drift_curve")
    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)

    curve = []
    for f in FRACTIONS:
        # md5-selected drifted subset: deterministic, fraction-nested
        # (f=0.25's drifted ids are a subset of f=0.5's)
        bucket = F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10
        )
        drifted = (bucket.cast("long") % 10000) < int(f * 10000)
        shifted_batch = batch.select(
            "vec_id",
            F.when(
                drifted, F.expr("transform(embedding, x -> x + 5.0)")
            ).otherwise(F.col("embedding")).alias("embedding"),
            "label",
        )
        corpus = base.unionByName(shifted_batch)
        path = index_dir(base, "pq", {"salt": "pqdrift", "f": f})
        if not _done(path):
            build_pq_index(base, path, m=_S6_M, k=_S6_K, salt="pqdrift")
        append_to_pq_index(shifted_batch, path, tag="drift")
        probes = corpus.filter(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)
        )
        t0 = time.time()
        got = {
            (r["q_id"], r["n_id"])
            for r in pq_serve_topk(
                corpus, probes, path,
                m=_S6_M, k=_S6_K, refine=_S6_REFINE, topk=_S6_TOPK,
            ).collect()
        }
        serve_wall = time.time() - t0
        truth = {
            (r["q_id"], r["n_id"])
            for r in brute_force_topk(corpus, probes, k=_S6_TOPK).collect()
        }
        n_probes = len({q for q, _ in truth})
        recall = len(got & truth) / max(len(truth), 1)
        seg = F.when(F.col("id") % 5 == 0, F.lit("appended")).otherwise(
            F.lit("base")
        )
        rep = {
            r["segment"]: r["mean_residual_energy"]
            for r in pq_residual_report(spark, corpus, path, seg).collect()
        }
        ratio = round(rep["appended"] / rep["base"], 3)
        cell = {
            "drifted_fraction": f,
            "recall_at_10": round(recall, 3),
            "residual_ratio": ratio,
            "serve_wall_sec": round(serve_wall, 1),
            "n_probes": n_probes,
        }
        curve.append(cell)
        print(json.dumps(cell), flush=True)

    rounds = [
        int(p.split("_r")[-1].split(".")[0])
        for p in os.listdir(REPO) if p.startswith("BENCH_r")
    ]
    n = (max(rounds) if rounds else 0) + 1
    path = os.path.join(REPO, f"SCALE_SPOT_r{n:02d}.json")
    out: dict = {"cells": {}}
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
    out["index_drift_study"] = {
        "protocol": (
            "PQ index built on the 100x base (160k vecs, salt pqdrift); "
            "the 20% batch appended with fraction f md5-shifted by +5.0 "
            "per coordinate; recall@10 of pq_serve vs brute force over "
            "the same corpus for the fixed 20-probe set; residual_ratio "
            "= s6d appended/base mean reconstruction energy; trigger "
            "rule: rebuild when ratio > 1.5"
        ),
        "sf_dir": sf_dir,
        "curve": curve,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
