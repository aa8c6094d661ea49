#!/usr/bin/env python3
"""Run the DuckDB-oracle parity suite (mirrors the driver's t2 gate).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from ae_data_integration_spark.oracle import run_parity
from ae_data_integration_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark("parity")
    t0 = time.time()
    results = run_parity(spark, sf_dir, names)
    n_ok = sum(r.ok for r in results)
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"{mark} {r.name:28s} rows={r.spark_rows}/{r.oracle_rows} {r.detail}")
    print(f"\n{n_ok}/{len(results)} ok in {time.time() - t0:.1f}s @ {sf_dir}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
