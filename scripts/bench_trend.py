#!/usr/bin/env python3
"""Cross-round bench trend: compare the latest BENCH_r*.json per-query
times against each query's best previously-recorded time and flag
regressions beyond a threshold (default 2x).

Usage: python scripts/bench_trend.py [--threshold 2.0] [bench.json ...]
With no files given, globs BENCH_r*.json in the repo root. Exits 1 if
any query in the newest file regressed beyond the threshold.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="bench JSON files, oldest first")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    files = args.files or sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "BENCH_r*.json"))
    )
    if len(files) < 2:
        print(f"need >= 2 bench files, found {len(files)} — nothing to compare")
        return 0

    rounds = []
    for f in files:
        try:
            with open(f) as fh:
                d = json.load(fh)
            # driver-recorded BENCH_r*.json wraps the bench line under
            # "parsed"; bench.py's own stdout is the flat form
            d = d.get("parsed", d)
            if d and d.get("queries"):
                rounds.append((os.path.basename(f), d["queries"]))
        except (json.JSONDecodeError, OSError) as e:
            print(f"skip {f}: {e}")
    if len(rounds) < 2:
        print("fewer than 2 usable rounds — nothing to compare")
        return 0

    latest_name, latest = rounds[-1]
    best_prior: dict[str, float] = {}
    for _, qs in rounds[:-1]:
        for q, t in qs.items():
            if q not in best_prior or t < best_prior[q]:
                best_prior[q] = t

    bad = []
    print(f"{latest_name} vs best prior ({len(rounds) - 1} rounds):")
    for q in sorted(latest):
        t = latest[q]
        prior = best_prior.get(q)
        if prior is None:
            print(f"  {q:28s} {t:7.3f}s  (new)")
            continue
        ratio = t / prior if prior > 0 else float("inf")
        flag = " <-- REGRESSION" if ratio > args.threshold else ""
        print(f"  {q:28s} {t:7.3f}s  best {prior:7.3f}s  x{ratio:.2f}{flag}")
        if ratio > args.threshold:
            bad.append(q)
    if bad:
        print(f"\n{len(bad)} queries beyond {args.threshold}x: {', '.join(bad)}")
        return 1
    print("\nno regressions beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
