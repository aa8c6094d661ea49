#!/usr/bin/env python3
"""Headline benchmark: runs the catalog's bench-tagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing covers plan construction + execution + collect (the driver-
visible latency of each query)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ae_data_integration_spark.catalog import load_all
from ae_data_integration_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    bench_queries = {n: q for n, q in sorted(registry.items()) if "bench" in q.tags}

    spark = get_spark("bench")
    # Warmup pass at the TARGET SF: first execution of each plan shape
    # pays JIT + whole-stage-codegen compilation and AQE replanning;
    # the measured numbers below are steady-state engine throughput at
    # the benchmark scale.
    for q in bench_queries.values():
        q.fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        # min of 3 timed reps: single-rep wall time on a 32-thread
        # local JVM swings ±20% with GC/JIT; the min is the
        # reproducible steady-state throughput number.
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            q.fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()  # drop per-query persists
        timings[name] = round(best, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
