#!/usr/bin/env python3
"""Streaming lifecycle under REAL micro-batch cadence (r12 judge task
#6): the stream==batch twin so far drained with availableNow over a
handful of files; a production drain is MANY small epochs where the
per-epoch fixed cost (probing the persisted corpus band table,
writing the accepted/drops/codes increment) dominates. This leg
measures, at 100x (.benchdata/sf10, 100k-doc batch vs 400k-doc
corpus):

  * single-shot: all batch files in one epoch (no maxFilesPerTrigger)
  * 20-epoch: the same files drained one per micro-batch
    (maxFilesPerTrigger=1)

and records total wall, s/epoch, and the implied per-epoch fixed
cost ((wall_20 - wall_1) / 19 — every term that does NOT scale with
batch rows: trigger overhead, corpus-probe scheduling, the three
per-epoch sink commits, the index increment). The corpus fp set and
band table persist ONCE per drain (streaming/lifecycle.py), so the
fixed cost must be sink/scheduling-bound, not a corpus recompute —
that is the amortization claim under test.

Protocol: fresh JVM per cell. Merges "stream_cadence_study" into
SCALE_SPOT_r{N}.json. Usage: python scripts/measure_stream_cadence.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.path.join(REPO, ".benchdata", "sf10")
N_FILES = 20

_CELL = """
import glob, json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
import os
from pyspark.sql import functions as F
from ae_data_integration_spark.session import get_spark
from ae_data_integration_spark.catalog.lifecycle_q import _P9_SALT
from ae_data_integration_spark.operators.ann_index import build_pq_index, index_dir
from ae_data_integration_spark.streaming.lifecycle import ingest_stream_to_lifecycle

spark = get_spark("cadence")
sf_dir = {sf_dir!r}
work = tempfile.mkdtemp(prefix="cadence_")
os.environ["SPARK_GRAFT_INDEX_DIR"] = os.path.join(work, "ann")

d = spark.read.parquet(f"{{sf_dir}}/documents.parquet")
e = spark.read.parquet(f"{{sf_dir}}/embeddings.parquet")
corpus = d.filter(F.col("doc_id") % 5 != 0)
batch = d.filter(F.col("doc_id") % 5 == 0)
base_e = e.filter(F.col("vec_id") % 5 != 0)

p = index_dir(base_e, "pq", {{"salt": _P9_SALT, "leg": "cadence"}})
t0 = time.time()
build_pq_index(base_e, p, m=8, k=32, salt=_P9_SALT)
build_wall = round(time.time() - t0, 1)

src = os.path.join(work, "doc_src")
batch.repartition({n_files}).write.mode("overwrite").parquet(src)
n_files = len(glob.glob(f"{{src}}/part-*"))

reader = spark.readStream.schema(d.schema)
if {per_file}:
    reader = reader.option("maxFilesPerTrigger", 1)
out = os.path.join(work, "out")
t0 = time.time()
ingest_stream_to_lifecycle(
    reader.parquet(src), corpus, e, out, p,
    query_name="cadence", checkpoint_dir=os.path.join(work, "ckpt"),
)
wall = round(time.time() - t0, 1)
n_epochs = len(glob.glob(f"{{out}}/accepted/b*"))
n_acc = spark.read.parquet(f"{{out}}/accepted/b*").count()
shutil.rmtree(work, ignore_errors=True)
print("CELL", json.dumps({{
    "wall_sec": wall, "build_wall_sec": build_wall,
    "n_epochs": n_epochs, "n_files": n_files, "n_accepted": n_acc,
    "sec_per_epoch": round(wall / max(n_epochs, 1), 2),
}}))
"""


def run_cell(per_file: bool) -> dict:
    p = subprocess.run(
        [sys.executable, "-c",
         _CELL.format(repo=REPO, sf_dir=SF_DIR, n_files=N_FILES,
                      per_file="True" if per_file else "False")],
        capture_output=True, text=True, timeout=5400, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CELL"):
            return json.loads(line[len("CELL"):])
    return {"failed": True, "exit_code": p.returncode,
            "stderr_tail": p.stderr[-2000:]}


def main() -> int:
    results = {}
    for name, per_file in (("single_shot", False), ("per_file_20_epochs", True)):
        rec = run_cell(per_file)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)
    if not any(r.get("failed") for r in results.values()):
        w1 = results["single_shot"]["wall_sec"]
        w20 = results["per_file_20_epochs"]["wall_sec"]
        k = results["per_file_20_epochs"]["n_epochs"] - 1
        results["per_epoch_fixed_cost_sec"] = round((w20 - w1) / max(k, 1), 2)
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
    out["stream_cadence_study"] = results
    out["recorded_unix"] = int(time.time())
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
