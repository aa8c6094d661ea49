#!/usr/bin/env python3
"""Phase-isolate the zipf-doc-length front half (the 13.7x wall at
2.9x volume measure_doc_skew.py found — candidate expansion DROPPED,
so the hot-band hypothesis is refuted and the straggler lives in
another phase). The isolate_g6b protocol: localCheckpoint at every
phase boundary, fresh JVM per variant.

Phases:
  P0 exact  — fingerprint anti-join (b1 materialized)
  P1 bands  — batch + corpus band tables (the shingle->minhash
              signature pass over ALL shingle rows; band tables are
              2 rows/doc, cheap to checkpoint)
  P2 cands  — bucket equi-join from the checkpointed band tables
  P3 verify — jaccard_verify (recomputes shingle hash-sets, as the
              real uncached plan does) -> near ids
Also records the per-partition max/mean shingle-row share (the
explode straggler diagnostic).

Usage: python scripts/isolate_doc_skew.py [uniform|zipfdoc|both]
Merges "doc_skew_phase_isolation" into SCALE_SPOT_r{N}.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS = {
    "uniform": os.path.join(REPO, ".benchdata", "sf10"),
    "zipfdoc": os.path.join(REPO, ".benchdata", "sf10_zipfdoc"),
}


def run_leg(sf_dir: str) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from ae_data_integration_spark.catalog.dedup_q import _P5_THRESH
    from ae_data_integration_spark.functions.text import fingerprint
    from ae_data_integration_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_band_table,
    )
    from ae_data_integration_spark.session import get_spark
    from ae_data_integration_spark.tables import table

    spark = get_spark("docskew_phase")
    out: dict = {}

    def clock(name, thunk):
        t0 = time.time()
        r = thunk()
        out[name] = round(time.time() - t0, 1)
        print(f"  {name}: {out[name]} s", flush=True)
        return r

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)

    def exact():
        corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct()
        return (
            batch.withColumn("fp", fingerprint("text"))
            .join(corpus_fp, "fp", "left_anti")
            .select("doc_id", "source", "text")
            .localCheckpoint()
        )

    b1 = clock("p0_exact", exact)
    sh_b = doc_shingles(b1, "doc_id", "text", k=5, spread=True)
    sh_c = doc_shingles(corpus, "doc_id", "text", k=5, spread=True)

    # explode-skew diagnostic: per-partition shingle-row distribution
    def part_share(sh):
        rows = (
            sh.select(F.explode("shs").alias("s"))
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid").count().collect()
        )
        tot = sum(r["count"] for r in rows)
        return round(max(r["count"] for r in rows) * len(rows) / tot, 2)

    out["corpus_shingle_max_over_mean_partition"] = part_share(sh_c)

    ba = clock("p1_bands_batch",
               lambda: lsh_band_table(sh_b, 16, 2).localCheckpoint())
    bb = clock("p1_bands_corpus",
               lambda: lsh_band_table(sh_c, 16, 2).localCheckpoint())

    def cands():
        return (
            ba.alias("x").join(bb.alias("y"), ["band", "bucket"])
            .select(F.col("x.doc").alias("doc_a"),
                    F.col("y.doc").alias("doc_b"))
            .distinct()
            .localCheckpoint()
        )

    cd = clock("p2_cands", cands)
    out["n_cands"] = cd.count()
    near = clock(
        "p3_verify",
        lambda: jaccard_verify(
            cd, sh_b.unionByName(sh_c), threshold=_P5_THRESH
        ).select(F.col("doc_a").alias("doc_id")).distinct().localCheckpoint(),
    )
    out["n_near"] = near.count()
    out["total_sec"] = round(
        sum(v for k, v in out.items()
            if isinstance(v, float) and k.startswith("p")), 1
    )
    return out


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in VARIANTS:
        rec = run_leg(VARIANTS[which])
        print("LEGJSON", json.dumps(rec))
        return 0
    results = {}
    for name in ("uniform", "zipfdoc"):
        print(f"== {name}", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=5400, cwd=REPO,
        )
        sys.stdout.write(p.stdout)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("LEGJSON"):
                rec = json.loads(line[len("LEGJSON"):])
        if rec is None:
            print("FAILED", p.returncode, p.stderr[-2000:])
            return 1
        results[name] = rec
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
    out["doc_skew_phase_isolation"] = results
    out["recorded_unix"] = int(time.time())
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
