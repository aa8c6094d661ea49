#!/usr/bin/env python3
"""Snapshot .explain('formatted') plans + noop-sink timings for
bench-tagged queries.

Usage:
    python scripts/snapshot_plans.py <out_suffix> [sf_dir] [query ...]

Writes plans/r12/<query>_<out_suffix>.txt for each query (the judge
checks plan claims against these files) and prints a JSON line of
per-query noop-sink wall seconds (min of `reps`).

Plan snapshots come from the SAME session that timed the query, and
the noop sink computes every column (guide §1.4) so the timing is the
computation, not the collect/driver transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from ae_data_integration_spark.catalog import load_all
from ae_data_integration_spark.functions.caching import release_tracked
from ae_data_integration_spark.session import get_spark

PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    reps = int(os.environ.get("SNAP_REPS", "3"))

    registry = load_all()
    if not names:
        names = [n for n, q in sorted(registry.items()) if "bench" in q.tags]

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("plansnap")
    times: dict[str, float] = {}
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"snap:{name}")
        # warmup (JIT/codegen/AQE + artifact builds)
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        release_tracked()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
            release_tracked()
        times[name] = round(best, 3)
        # plan snapshot (fresh build so tracked persists are live)
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        release_tracked()
        print(f"{times[name]:8.3f}s  {name}", flush=True)
    print(json.dumps({"suffix": suffix, "sf_dir": sf_dir, "times": times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
