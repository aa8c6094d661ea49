#!/usr/bin/env python3
"""Round-close parity recorder: run the FULL registry through both
verification harnesses in fresh subprocesses and commit the combined
evidence as PARITY_LOCAL_r{N}.json.

Why: the external driver hash-checks only the first 50 alphabetical
registry names and the rotation is frozen, so ~1/3 of the catalog can
never gain an externally recorded verification row; until round 9
that evidence was re-derived per judge (~7 min of reruns). This file
makes it durable (VERDICT r8, task #1):

- "parity":     scripts/check_parity.py — the engine's own session
                (get_spark defaults), every registered query vs its
                DuckDB value-hash oracle or declared contract.
- "hostile":    scripts/driver_sim.py — a driver-shaped session
                (local[8], +5:30 timezone, no engine configs) plus a
                strict per-column dtype comparison.

Each leg runs in its own subprocess because SparkSession configs are
per-JVM: getOrCreate() in one process would hand the second leg the
first leg's session. Round number auto-detects like bench.py
(max recorded BENCH_r*.json + 1), overridable via SPARK_GRAFT_ROUND.

Usage: python scripts/record_parity.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_number() -> int:
    n = os.environ.get("SPARK_GRAFT_ROUND")
    if n is not None:
        return int(n)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) if rounds else 0) + 1


def _run_leg(script: str, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        tmp = tf.name
    try:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", script),
                 "--json", tmp, sf_dir],
                cwd=REPO, capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired as exc:
            return {
                "failed": True,
                "error": f"timeout after {exc.timeout}s",
                "wall_sec": round(time.time() - t0, 1),
                "exit_code": None,
                "stdout_tail": (exc.stdout or b"")[-2000:].decode("utf-8", "replace")
                if isinstance(exc.stdout, bytes) else (exc.stdout or "")[-2000:],
                "stderr_tail": (exc.stderr or b"")[-4000:].decode("utf-8", "replace")
                if isinstance(exc.stderr, bytes) else (exc.stderr or "")[-4000:],
            }
        try:
            with open(tmp) as fh:
                record = json.load(fh)
        except (OSError, json.JSONDecodeError) as exc:
            # A leg that died before writing its JSON (Spark OOM,
            # import error, timeout) must still leave a durable record
            # with the context needed to diagnose it, not crash the
            # recorder and lose the captured output.
            record = {
                "failed": True,
                "error": f"{type(exc).__name__}: {exc}",
                "stderr_tail": proc.stderr[-4000:],
            }
        record["wall_sec"] = round(time.time() - t0, 1)
        record["exit_code"] = proc.returncode
        # keep the tail of stdout for context on failures
        if proc.returncode != 0 or record.get("failed"):
            record["stdout_tail"] = proc.stdout[-2000:]
        return record
    finally:
        os.unlink(tmp)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = _round_number()
    out = {
        "round": n,
        "sf_dir": sf_dir,
        "recorded_unix": int(time.time()),
        "parity": _run_leg("check_parity.py", sf_dir),
        "hostile": _run_leg("driver_sim.py", sf_dir),
    }
    name = f"PARITY_LOCAL_r{n:02d}.json"
    path = os.path.join(REPO, name)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    p, h = out["parity"], out["hostile"]

    def leg_line(r: dict) -> str:
        if r.get("failed"):
            return f"FAILED ({r['error']}, {r['wall_sec']}s)"
        return f"{r['n_ok']}/{r['n_total']} ({r['wall_sec']}s)"

    print(
        f"wrote {name}: parity {leg_line(p)}, hostile {leg_line(h)}, "
        f"dtype divergences: {len(h.get('dtype_divergences', []))}"
    )
    ok = (
        not p.get("failed")
        and not h.get("failed")
        and p["n_ok"] == p["n_total"]
        and h["n_ok"] == h["n_total"]
        and not h.get("dtype_divergences")
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
