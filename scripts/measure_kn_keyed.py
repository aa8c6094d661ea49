#!/usr/bin/env python3
"""Exercise the KN-5 keyed-join gram-table fallback FOR REAL (r12
judge task #1): build the Kneser-Ney artifact at a realistic
vocabulary (V=8192 — the CCNet/KenLM shape, not the 64-token fixture)
so the size-adaptive switch in operators/lm._maybe_broadcast actually
takes the keyed branch, then

  * equality leg (10x, .benchdata/sf1): score the whole corpus under
    the FORCED keyed plan (bcast_max_bytes=0) and under a raised
    threshold that broadcasts every table — assert the two result
    sets are IDENTICAL row-for-row (the t25k parity row proves the
    same at fixture scale against the DuckDB oracle; this proves it
    at a vocab where the tables are genuinely large);
  * decade legs (10x/100x, + 1000x with --leg 1000x): serve wall
    under the DEFAULT adaptive threshold, recording which plan the
    size estimate actually chose (SortMergeJoin count in the plan) —
    the decade row for SCALE.md.

Protocol: fresh JVM per cell. Merges "kn_keyed_study" into
SCALE_SPOT_r{N}.json. Usage:
    python scripts/measure_kn_keyed.py [--legs 10x,100x]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEGS = {
    "10x": os.path.join(REPO, ".benchdata", "sf1"),
    "100x": os.path.join(REPO, ".benchdata", "sf10"),
    "1000x": os.path.join(REPO, ".benchdata", "sf100"),
}
V = 8192

_CELL = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ae_data_integration_spark.session import get_spark
from ae_data_integration_spark.functions.text import tokens
from ae_data_integration_spark.operators.lm import ensure_kn_lm, kn_serve_scored
from ae_data_integration_spark.tables import table

spark = get_spark("kn_keyed")
sf_dir = {sf_dir!r}
d = table(spark, sf_dir, "documents")
toks = d.select("doc_id", "lang", tokens("text").alias("t"))

t0 = time.time()
path = ensure_kn_lm(toks, "t", train_filter=(F.col("lang") == 'en'),
                    v={v}, salt="t25w")
build_wall = round(time.time() - t0, 1)
sizes = {{
    name: spark.read.parquet(f"{{path}}/{{name}}").count()
    for name in ("g5", "g4", "g3", "g2", "g1")
}}

scored = kn_serve_scored(toks, path, "t")
plan = scored._jdf.queryExecution().executedPlan().toString()
n_smj = plan.count("SortMergeJoin")
n_bhj = plan.count("BroadcastHashJoin")
t0 = time.time()
agg = scored.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_tok").alias("s")).first()
serve_wall = round(time.time() - t0, 1)

rec = {{"build_wall_sec": build_wall, "serve_wall_sec": serve_wall,
        "rows": int(agg["n"]), "gram_table_rows": sizes,
        "plan_sort_merge_joins": n_smj, "plan_broadcast_hash_joins": n_bhj}}

if {equality}:
    keyed = kn_serve_scored(toks, path, "t", bcast_max_bytes=0)
    bcast = kn_serve_scored(toks, path, "t", bcast_max_bytes=1 << 31)
    t0 = time.time()
    a = keyed.withColumn("avg_q", F.round(F.col("avg_nll") * 1073741824).cast("long"))
    b = bcast.withColumn("avg_q", F.round(F.col("avg_nll") * 1073741824).cast("long"))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    rec["equality_check_sec"] = round(time.time() - t0, 1)
    rec["keyed_vs_broadcast_diff_rows"] = int(diff)
    kp = keyed._jdf.queryExecution().executedPlan().toString()
    bp = bcast._jdf.queryExecution().executedPlan().toString()
    rec["keyed_plan_smj"] = kp.count("SortMergeJoin")
    rec["keyed_plan_bhj"] = kp.count("BroadcastHashJoin")
    rec["bcast_plan_bhj"] = bp.count("BroadcastHashJoin")

print("CELL", json.dumps(rec))
"""


def run_cell(sf_dir: str, equality: bool) -> dict:
    p = subprocess.run(
        [sys.executable, "-c",
         _CELL.format(repo=REPO, sf_dir=sf_dir, v=V,
                      equality="True" if equality else "False")],
        capture_output=True, text=True, timeout=5400, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CELL"):
            return json.loads(line[len("CELL"):])
    return {"failed": True, "exit_code": p.returncode,
            "stderr_tail": p.stderr[-2000:]}


def main() -> int:
    legs = ["10x", "100x"]
    if "--legs" in sys.argv:
        legs = sys.argv[sys.argv.index("--legs") + 1].split(",")
    results = {}
    for leg in legs:
        d = LEGS[leg]
        if not os.path.isdir(d):
            print(f"missing {d}")
            return 2
        rec = run_cell(d, equality=(leg == "10x"))
        results[leg] = rec
        print(leg, json.dumps(rec), flush=True)
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
    study = out.setdefault("kn_keyed_study", {
        "vocab": V,
        "protocol": "fresh JVM per cell; build once (content-addressed), "
                    "timed serve; equality leg diffs the forced-keyed vs "
                    "forced-broadcast result sets row-for-row",
    })
    study.setdefault("legs", {}).update(results)
    out["recorded_unix"] = int(time.time())
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
