#!/usr/bin/env python3
"""Time every catalog query (Spark side only) at a given sf_dir.

Usage: python scripts/profile_queries.py [sf_dir]
Prints per-query wall seconds sorted descending + total.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from ae_data_integration_spark.catalog import load_all
from ae_data_integration_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile")
    registry = load_all()
    times: dict[str, float] = {}
    t_all = time.time()
    for name, q in sorted(registry.items()):
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            n = df.count()
            err = ""
        except Exception as e:  # noqa: BLE001
            n, err = -1, f" ERR {e}"
        times[name] = time.time() - t0
        print(f"{times[name]:7.2f}s {name:30s} rows={n}{err}", flush=True)
    total = time.time() - t_all
    print("\n--- slowest ---")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t:7.2f}s {name}")
    print(f"\nTOTAL {total:.1f}s for {len(registry)} queries @ {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
