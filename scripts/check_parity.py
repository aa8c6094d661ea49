#!/usr/bin/env python3
"""Run the DuckDB-oracle parity suite (mirrors the driver's t2 gate).

Usage: python scripts/check_parity.py [--json OUT.json] [sf_dir] [query ...]

--json writes a machine-readable per-query record (name -> ok /
detail / row counts) so each round can COMMIT the full-registry
verification instead of every judge re-running it (VERDICT r8 #1);
scripts/record_parity.py bundles it with the hostile-session run
into PARITY_LOCAL_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from ae_data_integration_spark.oracle import run_parity
from ae_data_integration_spark.session import get_spark


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or None
    spark = get_spark("parity")
    t0 = time.time()
    results = run_parity(spark, sf_dir, names)
    n_ok = sum(r.ok for r in results)
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"{mark} {r.name:28s} rows={r.spark_rows}/{r.oracle_rows} {r.detail}")
    wall = round(time.time() - t0, 1)
    print(f"\n{n_ok}/{len(results)} ok in {wall}s @ {sf_dir}")
    if json_out:
        record = {
            "sf_dir": sf_dir,
            "n_ok": n_ok,
            "n_total": len(results),
            "wall_sec": wall,
            "queries": {
                r.name: {
                    "ok": bool(r.ok),
                    "detail": r.detail,
                    "spark_rows": r.spark_rows,
                    "oracle_rows": r.oracle_rows,
                }
                for r in results
            },
        }
        with open(json_out, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {json_out}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
