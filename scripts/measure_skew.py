#!/usr/bin/env python3
"""Skew-hardening measurement: the user-keyed event queries on
uniform vs zipf key distributions at 100x.

Claim under test: the engine's event plans degrade gracefully under a
zipf key distribution (hottest user ~4% of ALL rows) — wall-clock on
the zipf variant stays under 2x the uniform variant, and the
straggler term is bounded because
  * groupBy aggregates pre-combine map-side (a hot key reaches the
    reduce task as <= #map-partitions partial rows, not raw rows);
  * per-user windows (e2 sessionize) concentrate the hot user into
    one task, but that task's work is O(hot_rows log hot_rows) local
    sort — percent-level shares stay minutes-bounded at any corpus
    size, and the task spills rather than OOMs;
  * e12's join key is the HOUR BUCKET, not the user, so user skew
    never concentrates its shuffle.

Protocol: fresh JVM per (query, variant) cell, single timed collect —
the spot_scale1000 discipline. Also records each variant's max
per-task input share for e2's window stage via the hot-key share
(driver-side aggregate, not a timing).

Merges into SCALE_SPOT_r{N}.json under "skew_study".
Usage: python scripts/measure_skew.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = ("e2_sessionize", "e12_session_incident_overlap", "e8_cohort_retention")
VARIANTS = {
    "uniform": os.path.join(REPO, ".benchdata", "sf10"),
    "zipf": os.path.join(REPO, ".benchdata", "sf10_zipf"),
}

_CELL = """
import sys, time
sys.path.insert(0, {repo!r})
from ae_data_integration_spark.session import get_spark
from ae_data_integration_spark.catalog import load_all, resolve
spark = get_spark("skewleg")
reg = load_all()
q = reg[resolve({name!r})]
t0 = time.time()
rows = q.fn(spark, {sf_dir!r}).collect()
print("SKEW", time.time() - t0, len(rows))
"""


def run_cell(name: str, sf_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CELL.format(repo=REPO, name=name, sf_dir=sf_dir)],
        capture_output=True, text=True, timeout=3000, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SKEW"):
            _, wall, n = line.split()
            return {"wall_sec": round(float(wall), 1), "rows": int(n)}
    return {"failed": True, "exit_code": p.returncode,
            "stderr_tail": p.stderr[-1200:]}


def main() -> int:
    for v, d in VARIANTS.items():
        if not os.path.isfile(os.path.join(d, "events.parquet")):
            print(f"missing {d}/events.parquet — run make_skew_data.py first")
            return 2
    import duckdb

    con = duckdb.connect()
    shares = {}
    for v, d in VARIANTS.items():
        shares[v] = con.execute(f"""
            SELECT MAX(n) * 1.0 / SUM(n) FROM (
              SELECT COUNT(*) AS n
              FROM read_parquet('{d}/events.parquet') GROUP BY user_id)
        """).fetchone()[0]
    study: dict = {
        "protocol": "fresh JVM per cell, single timed collect; zipf = "
                    "s=1 inverse-CDF remap of user_id (make_skew_data.py); "
                    "hot_key_share = hottest user's fraction of all events",
        "hot_key_share": {v: round(s, 4) for v, s in shares.items()},
        "cells": {},
    }
    # e12 needs the full star schema next to events: the zipf dir has
    # only events.parquet, so symlink the rest from the uniform dir.
    zd = VARIANTS["zipf"]
    for f in os.listdir(VARIANTS["uniform"]):
        dst = os.path.join(zd, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(VARIANTS["uniform"], f), dst)
    for name in QUERIES:
        for v, d in VARIANTS.items():
            rec = run_cell(name, d)
            study["cells"].setdefault(name, {})[v] = rec
            print(name, v, json.dumps(rec), flush=True)
        cells = study["cells"][name]
        if not any(c.get("failed") for c in cells.values()):
            study["cells"][name]["zipf_over_uniform"] = round(
                cells["zipf"]["wall_sec"] / max(cells["uniform"]["wall_sec"], 0.1),
                2,
            )
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
    out["skew_study"] = study
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
