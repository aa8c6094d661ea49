#!/usr/bin/env python3
"""Dedup-family skew leg: the pipe9 front half (exact fp anti-join +
cross-LSH near-dedup, catalog/lifecycle_q._p9_dedup) on the uniform
sf10 corpus vs the zipf-doc-length + shared-boilerplate variant
(make_skew_docs.py) — the LSH-band hot-bucket shape, distinct from
the user_id skew already measured (measure_skew.py).

Claim under test: the band-join degrades gracefully under document
skew — wall on the skewed variant stays within 2x of VOLUME-NORMALIZED
uniform wall (the skewed corpus carries ~3x the shingle rows by
construction; the straggler term is what's left after dividing that
out). AQE skew-join splitting (on in session.py) is the mechanism
that should bound the hot bucket's single-key expansion.

Records per variant: front-half wall, accepted/near counts, shingle
rows, band-table bucket stats (top bucket, sum of batch x corpus
products = the exact candidate-join expansion) — merged into
SCALE_SPOT_r{N}.json under "doc_skew_study".

Protocol: fresh JVM per cell (spot_scale1000 discipline).
Usage: python scripts/measure_doc_skew.py
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

_CELL = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ae_data_integration_spark.session import get_spark
from ae_data_integration_spark.catalog.lifecycle_q import _p9_dedup
from ae_data_integration_spark.operators.dedup import doc_shingles, lsh_band_table
from ae_data_integration_spark.tables import table

spark = get_spark("docskew")
sf_dir = {sf_dir!r}

t0 = time.time()
batch, b1, near, accepted = _p9_dedup(spark, sf_dir)
n_acc = accepted.count()
wall = time.time() - t0
n_near = near.count()

# untimed diagnostics: volume + bucket expansion
d = table(spark, sf_dir, "documents")
sh_b = doc_shingles(d.filter(F.col("doc_id") % 5 == 0), "doc_id", "text", k=5, spread=True)
sh_c = doc_shingles(d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", k=5, spread=True)
shingle_rows = (
    sh_b.select(F.sum(F.size("shs"))).first()[0]
    + sh_c.select(F.sum(F.size("shs"))).first()[0]
)
bb = lsh_band_table(sh_c, 16, 2).groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("nc"))
ba = lsh_band_table(sh_b, 16, 2).groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("nb"))
x = ba.join(bb, ["band", "bucket"]).agg(
    F.sum(F.col("nb") * F.col("nc")).alias("expansion"),
    F.max(F.col("nb") * F.col("nc")).alias("top_bucket_product"),
).first()
print("CELL", json.dumps({{
    "wall_sec": round(wall, 1),
    "n_accepted": n_acc,
    "n_near": n_near,
    "shingle_rows": int(shingle_rows),
    "candidate_expansion": int(x["expansion"] or 0),
    "top_bucket_product": int(x["top_bucket_product"] or 0),
}}))
"""


def main() -> int:
    results = {}
    for variant, d in VARIANTS.items():
        if not os.path.isdir(d):
            print(f"missing {d} — run scripts/make_skew_docs.py first")
            return 2
        p = subprocess.run(
            [sys.executable, "-c",
             _CELL.format(repo=REPO, sf_dir=d)],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("CELL"):
                rec = json.loads(line[len("CELL"):])
        if rec is None:
            print("FAILED", variant, p.returncode, p.stderr[-2000:])
            return 1
        results[variant] = rec
        print(variant, json.dumps(rec), flush=True)
    u, z = results["uniform"], results["zipfdoc"]
    vol = z["shingle_rows"] / max(u["shingle_rows"], 1)
    raw = z["wall_sec"] / max(u["wall_sec"], 0.1)
    results["wall_ratio_raw"] = round(raw, 2)
    results["volume_ratio_shingles"] = round(vol, 2)
    results["wall_ratio_volume_normalized"] = round(raw / vol, 2)
    results["straggler_bound_2x_holds"] = bool(raw / vol < 2.0)
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
    out["doc_skew_study"] = results
    out["recorded_unix"] = int(time.time())
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, dict)}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
