#!/usr/bin/env python3
"""Zipf-skewed events variant for the skew-hardening leg.

The bench corpus's user_id is uniform, so every user-keyed shuffle
(e2 sessionize windows, e8 cohorts, the e12 session side) sees
balanced tasks by construction — the 100-TB reality is zipf-ish
traffic where the hottest user/tenant holds percent-level shares of
ALL events. This generator remaps user_id on a copy of an events
table to an s=1 zipf (P(rank k) ∝ 1/k) via inverse-CDF over the
md5-uniform of event_id:

    u = md5_frac(event_id) ∈ [0,1)  →  user' = floor(exp(u·ln(N)))

so rank 1 receives ≈ ln(2)/ln(N) of all rows (~4.3% at N=60k) — a
genuine hot key — while the key domain stays [1, N]. Deterministic,
portable (md5 arithmetic only), and row count / timestamps / types
are untouched, so wall-clock against the uniform variant isolates the
skew term alone.

Usage: python scripts/make_skew_data.py [src_dir] [out_dir]
(defaults: .benchdata/sf10 -> .benchdata/sf10_zipf; copies ONLY
events — point queries needing other tables at the source dir.)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf10"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".benchdata", "sf10_zipf"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT MAX(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    # Two skew knobs in one variant:
    # * user_id -> s=1 zipf (hot user ~ ln2/lnN of all rows) — the
    #   straggler test for user-keyed windows/aggregates (e2/e8);
    # * 8% of events (md5-selected) compressed into a 3-hour hot
    #   window — hourly counts there blow past the 2x-average rule,
    #   so e12's incident side is NON-degenerate (uniform replication
    #   yields zero incidents) and its exploded-bucket join sees the
    #   hot-key shape it claims to survive.
    con.execute(f"""
        COPY (
          SELECT event_id,
                 CASE WHEN (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'h'), 1, 12))
                                 AS BIGINT) % 10000) < 800
                      THEN (SELECT MIN(ts) FROM read_parquet('{src}/events.parquet'))
                           + INTERVAL (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 's'), 1, 8))
                                            AS BIGINT) % 10800) SECOND
                      ELSE ts END AS ts,
                 CAST(floor(exp(
                   (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
                         AS BIGINT) / 281474976710656.0) * ln({n_users})
                 )) AS BIGINT) AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    top = con.execute(f"""
        SELECT user_id, COUNT(*) AS n,
               COUNT(*) * 1.0 / (SELECT COUNT(*)
                                 FROM read_parquet('{out}/events.parquet')) AS share
        FROM read_parquet('{out}/events.parquet')
        GROUP BY user_id ORDER BY n DESC LIMIT 3
    """).fetchall()
    print("top keys:", top)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
