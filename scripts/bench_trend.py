#!/usr/bin/env python3
"""Cross-round bench trend with protocol-aware baselines.

Rounds 1-6 mixed measurement protocols (r5: hot shared JVM; r6:
fresh-JVM isolated for the top-5 and min-of-both reported), so naive
cross-round deltas measured JVM warmth, not plan changes (verified in
round 6: c6_gaussian_nb_cv timed ~2.12 s under BOTH the r5 and r6
commits while the trend line showed 1.534 -> 3.165). Round 7 pinned
the protocol and recorded a one-shot BENCH_STEADY.json holding BOTH
legs for every bench query:

- "shared":   one warm JVM, min-of-3 after a full warmup pass
              (bench.py's shared-session numbers);
- "isolated": fresh JVM per query, min-of-3 after 1 warmup rep
              (bench.py's isolation re-timing numbers).

When BENCH_STEADY.json exists, the newest BENCH_r*.json is compared
against it LIKE PROTOCOL TO LIKE: a query that appears in the round's
"isolation_check" was reported under the isolated protocol and
compares against the steady isolated leg; every other query compares
against the steady shared leg. Earlier BENCH_r*.json files are never
used as a regression baseline (they are protocol-mixed history).

Without BENCH_STEADY.json the legacy best-prior-round comparison runs
(still useful on a fresh checkout).

Usage: python scripts/bench_trend.py [--threshold 1.5] [bench.json ...]
Exits 1 if any query in the newest file regressed beyond the
threshold vs its like-protocol steady baseline.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load(path: str) -> dict | None:
    try:
        with open(path) as fh:
            d = json.load(fh)
        # driver-recorded BENCH_r*.json wraps the bench line under
        # "parsed"; bench.py's own stdout is the flat form
        d = d.get("parsed", d) or {}
        # since round 8 the stdout line is COMPACT (total + per-query
        # only) and points at the full on-disk record bench.py wrote —
        # prefer that (it carries isolation_check/streaming/scale legs)
        full = d.get("full_record")
        if full:
            fp = os.path.join(ROOT, os.path.basename(full))
            if os.path.exists(fp) and os.path.abspath(fp) != os.path.abspath(path):
                with open(fp) as fh:
                    return json.load(fh)
        return d
    except (json.JSONDecodeError, OSError) as e:
        print(f"skip {path}: {e}")
        return None


def _steady_compare(latest_name: str, latest: dict, steady: dict,
                    threshold: float) -> int:
    shared = steady["protocols"].get("shared", {})
    isolated = steady["protocols"].get("isolated", {})
    iso_keys = set(latest.get("isolation_check", {}))
    bad = []
    print(f"{latest_name} vs BENCH_STEADY (like protocol to like):")
    for q in sorted(latest["queries"]):
        t = latest["queries"][q]
        proto = "isolated" if q in iso_keys else "shared"
        base = (isolated if q in iso_keys else shared).get(q)
        if base is None:
            print(f"  {q:32s} {t:7.3f}s  (new — no steady baseline)")
            continue
        ratio = t / base if base > 0 else float("inf")
        flag = " <-- REGRESSION" if ratio > threshold else ""
        print(f"  {q:32s} {t:7.3f}s  steady[{proto}] {base:7.3f}s"
              f"  x{ratio:.2f}{flag}")
        if ratio > threshold:
            bad.append(q)
    # report-chain legs (VERDICT r8 #4): the flagship §3.3 deliverable
    # gets the same regression gate as the query wall. full_width is
    # one-shot on both sides, so its effective threshold is widened.
    rep_base = steady.get("report") or {}
    rep_latest = latest.get("report") or {}
    for leg, base_key, widen in (
        ("fixture", "fixture_wall_sec", 1.0),
        ("full_width", "full_width_wall_sec", 1.3),
    ):
        t = (rep_latest.get(leg) or {}).get("wall_sec")
        base = rep_base.get(base_key)
        if t is None or base is None:
            continue
        ratio = t / base if base > 0 else float("inf")
        limit = threshold * widen
        flag = " <-- REGRESSION" if ratio > limit else ""
        print(f"  report:{leg:25s} {t:7.3f}s  steady {base:7.3f}s"
              f"  x{ratio:.2f} (limit {limit:.2f}){flag}")
        if ratio > limit:
            bad.append(f"report:{leg}")
    if bad:
        print(f"\n{len(bad)} queries beyond {threshold}x vs steady: "
              f"{', '.join(bad)}")
        return 1
    print("\nno regressions beyond threshold vs steady baseline")
    return 0


def _legacy_compare(rounds: list, threshold: float) -> int:
    latest_name, latest = rounds[-1]
    best_prior: dict[str, float] = {}
    for _, d in rounds[:-1]:
        for q, t in d["queries"].items():
            if q not in best_prior or t < best_prior[q]:
                best_prior[q] = t
    bad = []
    print(f"{latest_name} vs best prior ({len(rounds) - 1} rounds) — "
          "WARNING: protocol-mixed history, deltas may be warmth:")
    for q in sorted(latest["queries"]):
        t = latest["queries"][q]
        prior = best_prior.get(q)
        if prior is None:
            print(f"  {q:32s} {t:7.3f}s  (new)")
            continue
        ratio = t / prior if prior > 0 else float("inf")
        flag = " <-- REGRESSION" if ratio > threshold else ""
        print(f"  {q:32s} {t:7.3f}s  best {prior:7.3f}s  x{ratio:.2f}{flag}")
        if ratio > threshold:
            bad.append(q)
    if bad:
        print(f"\n{len(bad)} queries beyond {threshold}x: {', '.join(bad)}")
        return 1
    print("\nno regressions beyond threshold")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="bench JSON files, oldest first")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio vs like-protocol baseline (default 1.5; "
                         "legacy best-prior mode uses max(threshold, 2.0))")
    args = ap.parse_args()

    files = args.files
    if not files:
        # one file per round, preferring bench.py's own full on-disk
        # record (BENCH_LOCAL_rN.json) over the driver's stdout-tail
        # capture (BENCH_rN.json, which round 7 showed can truncate)
        by_round: dict[int, str] = {}
        for f in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))) + sorted(
            glob.glob(os.path.join(ROOT, "BENCH_LOCAL_r*.json"))
        ):
            m = re.search(r"BENCH(?:_LOCAL)?_r(\d+)\.json$", f)
            if m:
                by_round[int(m.group(1))] = f  # LOCAL sorts later → wins
        files = [by_round[n] for n in sorted(by_round)]
    rounds = [
        (os.path.basename(f), d)
        for f in files
        if (d := _load(f)) and d.get("queries")
    ]
    if not rounds:
        print("no usable bench files — nothing to compare")
        return 0

    steady_path = os.path.join(ROOT, "BENCH_STEADY.json")
    if os.path.exists(steady_path):
        steady = _load(steady_path)
        if steady and steady.get("protocols"):
            return _steady_compare(*rounds[-1], steady, args.threshold)

    if len(rounds) < 2:
        print("fewer than 2 usable rounds and no BENCH_STEADY.json — "
              "nothing to compare")
        return 0
    return _legacy_compare(rounds, max(args.threshold, 2.0))


if __name__ == "__main__":
    sys.exit(main())
