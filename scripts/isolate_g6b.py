#!/usr/bin/env python3
"""Phase-isolate g6b_lpa_wide's third-decade residual (r11 watch item
#1, the d2b protocol): the 13.0x/decade cell's "checkpoint-write-
dominated, data-linear LPA tail" claim was a note, not a measurement.

Phases, cut exactly where the real plan materializes:
  P1 candidates — shingles -> 16-perm signature -> 2x8 bands ->
     bucket-join pairs, localCheckpointed (the d2b front half)
  P2 verify — jaccard_verify over the checkpointed pairs (includes
     its own shingle recompute, as the real uncached plan does)
  P3 lpa_setup — symmetrized edge table + init label vector
     (two localCheckpoints over O(E) rows)
  P3 lpa_gen_1..3 — one synchronous generation each: edge-label
     join + (node,label) count + per-node top-1 + localCheckpoint
  P4 rollup — community sizes + final join, collected

Protocol: fresh JVM per leg (this script runs ONE leg; the wrapper
loop spawns it per scale), single run, cold cost. Merges a
"g6b_phase_isolation" study section into SCALE_SPOT_r{N}.json.

Usage:
    python scripts/isolate_g6b.py             # both legs via subprocess
    python scripts/isolate_g6b.py --leg 100x  # one leg, in-process
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEGS = {
    "100x": os.path.join(REPO, ".benchdata", "sf10"),
    "1000x": os.path.join(REPO, ".benchdata", "sf100"),
}


def run_leg(sf_dir: str) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog.dedup_q import _D6_THRESH
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_candidate_pairs_from_shingles,
    )
    from ae_data_integration_spark.session import get_spark
    from ae_data_integration_spark.tables import table

    spark = get_spark("g6b_phase")
    out: dict = {}

    def clock(name, thunk):
        t0 = time.time()
        r = thunk()
        out[name] = round(time.time() - t0, 1)
        print(f"  {name}: {out[name]} s", flush=True)
        return r

    d = table(spark, sf_dir, "documents")
    shs = doc_shingles(d, "doc_id", "text", k=5, spread=True)
    pairs = clock(
        "p1_candidates",
        lambda: lsh_candidate_pairs_from_shingles(
            shs, num_perm=16, num_bands=2
        ).localCheckpoint(),
    )
    out["n_pairs"] = pairs.count()
    verified = clock(
        "p2_verify",
        lambda: jaccard_verify(pairs, shs, threshold=_D6_THRESH)
        .select("doc_a", "doc_b")
        .localCheckpoint(),
    )
    out["n_verified"] = verified.count()

    # label_propagation_fixed unrolled with per-phase clocks
    e = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))

    def setup():
        edges = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).localCheckpoint()
        lab = (
            edges.select(F.col("a").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("lbl"))
            .localCheckpoint()
        )
        return edges, lab

    edges, lab = clock("p3_lpa_setup", setup)
    out["n_nodes"] = lab.count()
    for i in (1, 2, 3):
        def gen(lab=lab):
            votes = (
                edges.join(lab.withColumnRenamed("id", "b"), "b")
                .groupBy("a", "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            w = Window.partitionBy("a").orderBy(F.desc("c"), "lbl")
            return (
                votes.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select(F.col("a").alias("id"), "lbl")
                .localCheckpoint()
            )

        lab = clock(f"p3_lpa_gen_{i}", gen)

    def rollup(lab=lab):
        sizes = lab.groupBy("lbl").agg(
            F.count(F.lit(1)).alias("community_size")
        )
        return lab.join(sizes, "lbl").count()

    out["rows"] = clock("p4_rollup", rollup)
    out["total_sec"] = round(
        sum(v for k, v in out.items() if k.startswith("p")), 1
    )
    return out


def main() -> int:
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
        rec = run_leg(LEGS[leg])
        print("LEGJSON", json.dumps(rec))
        return 0
    results = {}
    for leg, d in LEGS.items():
        print(f"== {leg} ({d})", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        sys.stdout.write(p.stdout)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("LEGJSON"):
                rec = json.loads(line[len("LEGJSON"):])
        if rec is None:
            print("FAILED", p.returncode, p.stderr[-1500:])
            return 1
        results[leg] = rec
    rounds = [
        int(x.split("_r")[-1].split(".")[0])
        for x in os.listdir(REPO) if x.startswith("BENCH_r")
    ]
    n = (max(rounds) if rounds else 0) + 1
    path = os.path.join(REPO, f"SCALE_SPOT_r{n:02d}.json")
    out = {"cells": {}}
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
    out["g6b_phase_isolation"] = {
        "protocol": "fresh JVM per leg, localCheckpoint at every phase "
                    "boundary so each clock covers exactly one phase",
        "legs": results,
    }
    out["recorded_unix"] = int(time.time())
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
