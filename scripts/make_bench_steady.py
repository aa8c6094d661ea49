#!/usr/bin/env python3
"""One-shot steady-state bench re-baseline (round 7).

Cross-round bench deltas through round 6 were warmth artifacts in both
directions: round 5 reported hot shared-JVM numbers, round 6 reported
fresh-JVM isolated reruns for its top-5 and min(shared, isolated) —
three different protocols in one trend line (the judge verified
c6_gaussian_nb_cv times ~2.12 s under BOTH commits while the trend
showed 1.534 -> 3.165). This script pins the protocol once and records
BOTH legs for every bench-tagged query so future rounds compare like
to like:

- "shared":   bench.py's shared-session protocol verbatim — one
              warmup pass over all queries, then min-of-3 per query in
              the same JVM.
- "isolated": bench.py's fresh-subprocess protocol verbatim — new JVM
              per query, 1 warmup rep, then min-of-3.

scripts/bench_trend.py uses BENCH_STEADY.json as the baseline wall:
BENCH_r{7+} shared-session numbers compare against the "shared" leg,
isolation_check numbers against the "isolated" leg; BENCH_r6 and
earlier are display-only history, never a regression baseline.

Usage:
  python scripts/make_bench_steady.py                 # full re-baseline
  python scripts/make_bench_steady.py --missing-only  # time ONLY bench
      keys absent from BENCH_STEADY.json and merge them in — the way
      NEW queries get baseline rows without resetting the existing
      wall (a full re-baseline every round would hide slow drift).
  python scripts/make_bench_steady.py --keys a,b,c    # re-time ONLY the
      named keys and merge — for queries whose PLAN deliberately
      changed (e.g. the r10 verify-prune family), where the old wall
      measures a plan that no longer exists. Never use this to absorb
      an unexplained regression: the merge list records every use.
  python scripts/make_bench_steady.py --report        # record steady
      rows for the §3.3 report chain (fixture: warmup + min-of-2;
      full reference width: one-shot, same as bench.py's protocol)
      under "report" so bench_trend regression-gates the flagship
      deliverable too (VERDICT r8 #4). Merges into the existing file.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _isolated_time, _timed  # noqa: E402
from ae_data_integration_spark.catalog import load_all  # noqa: E402
from ae_data_integration_spark.session import get_spark  # noqa: E402


def _report_baseline() -> None:
    """Record steady walls for the report chain: fixture leg warmup +
    min-of-2 in a warm session; full-width leg one-shot (that is
    bench.py's protocol for it — a second 157 s rep buys noise
    reduction worth less than its cost, so the trend threshold for
    full_width absorbs one-shot noise)."""
    from bench import _report_metrics
    from ae_data_integration_spark.session import get_spark

    path = os.path.join(REPO, "BENCH_STEADY.json")
    with open(path) as fh:
        prior = json.load(fh)

    spark = get_spark("bench-steady-report")
    never = lambda: 10**9  # noqa: E731 - no budget gate for a baseline
    _report_metrics(spark, never)  # fixture warmup
    fixture = min(
        _report_metrics(spark, never)["fixture"]["wall_sec"]
        for _ in range(2)
    )
    os.environ["SPARK_GRAFT_BENCH_FULL_REPORT"] = "1"
    full = _report_metrics(spark, never, full=True)["full_width"]["wall_sec"]

    prior["report"] = {
        "fixture_wall_sec": fixture,
        "full_width_wall_sec": full,
        "protocol": (
            "fixture: warm session, 1 warmup + min-of-2; full_width: "
            "one-shot in the same session (bench.py protocol)"
        ),
        "recorded_unix": int(time.time()),
    }
    with open(path, "w") as fh:
        json.dump(prior, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"wrote report steady rows: fixture {fixture}s, full_width {full}s")


def main() -> None:
    if "--report" in sys.argv:
        _report_baseline()
        return
    missing_only = "--missing-only" in sys.argv
    keys: set[str] | None = None
    if "--keys" in sys.argv:
        keys = set(sys.argv[sys.argv.index("--keys") + 1].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    bench_queries = {
        n: q for n, q in sorted(registry.items()) if "bench" in q.tags
    }

    path = os.path.join(REPO, "BENCH_STEADY.json")
    prior: dict = {}
    if keys is not None:
        with open(path) as fh:
            prior = json.load(fh)
        unknown = keys - set(bench_queries)
        if unknown:
            raise SystemExit(f"--keys not bench-tagged: {sorted(unknown)}")
        bench_queries = {n: q for n, q in bench_queries.items() if n in keys}
        print(f"re-timing {len(bench_queries)} keys: {sorted(bench_queries)}")
    elif missing_only:
        with open(path) as fh:
            prior = json.load(fh)
        have = set(prior["protocols"]["shared"])
        bench_queries = {
            n: q for n, q in bench_queries.items() if n not in have
        }
        if not bench_queries:
            print("no missing bench keys; BENCH_STEADY.json unchanged")
            return
        print(f"timing {len(bench_queries)} missing keys: "
              f"{sorted(bench_queries)}")

    spark = get_spark("bench-steady")
    for q in bench_queries.values():  # warmup pass (JIT/codegen/AQE)
        q.fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    shared: dict[str, float] = {}
    for name, q in bench_queries.items():
        shared[name] = round(_timed(q.fn, spark, sf_dir), 3)
        print(f"shared   {name:32s} {shared[name]:7.3f}s", flush=True)
    spark.stop()

    isolated: dict[str, float] = {}
    for name in bench_queries:
        t = _isolated_time(name, sf_dir)
        if t == t:  # not NaN
            isolated[name] = round(t, 3)
            print(f"isolated {name:32s} {isolated[name]:7.3f}s", flush=True)
        else:
            print(f"isolated {name:32s}  FAILED", flush=True)

    if prior:
        prior["protocols"]["shared"].update(shared)
        prior["protocols"]["isolated"].update(isolated)
        prior.setdefault("merges", []).append(
            {"keys": sorted(shared), "recorded_unix": int(time.time())}
        )
        out = prior
    else:
        out = {
            "protocols": {"shared": shared, "isolated": isolated},
            "sf_dir": sf_dir,
            "recorded_unix": int(time.time()),
            "note": (
                "steady-state re-baseline, round 7: shared = one warm JVM, "
                "min-of-3 after a full warmup pass; isolated = fresh JVM "
                "per query, min-of-3 after 1 warmup rep. bench_trend.py "
                "compares like protocol to like against this file. New "
                "keys merge in via --missing-only (see 'merges')."
            ),
        }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}: {len(shared)} shared, {len(isolated)} isolated")


if __name__ == "__main__":
    main()
