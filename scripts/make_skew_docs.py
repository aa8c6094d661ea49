#!/usr/bin/env python3
"""Zipf DOC-LENGTH + shared-boilerplate documents variant — the
dedup-family skew leg (r12 judge task #4).

The uniform bench corpus has near-constant doc lengths (~300 chars),
so the LSH band tables see balanced buckets by construction. The
100-TB reality has two document-side skew terms the event-side zipf
study (make_skew_data.py) does not exercise:

* zipf LENGTH: shingle rows per doc follow a heavy tail. Each doc is
  expanded to ``rep`` parts, rep = floor(exp(u * ln(8))) in [1, 8]
  with u = md5-uniform(doc_id) — P(rep >= k) = 1 - ln(k)/ln(8), mean
  ~3.4. Part 0 is the original text; part j is an md5-permutation
  character rotation (the make_scale_data.py cipher), so every part
  contributes DISTINCT shingles (repetition would collapse into the
  same shingle set and create no volume) and no cross-doc similarity
  is manufactured.

* shared BOILERPLATE (the band hot-bucket killer): 0.5% of docs
  (doc_id % 200 == 0) get a fixed ~1.6k-char template appended.
  Template shingles dominate those docs' minhash signatures, so they
  collapse into a few shared band buckets — the biggest bucket holds
  ~2.5k docs and its batch x corpus candidate expansion lands on ONE
  join key. This is exactly web-corpus reality (navigation chrome,
  cookie banners) and the shape AQE skew-join splitting claims to
  bound.

Embeddings/other tables are symlinked unchanged (the dedup front half
reads only documents; pipe9's later stages need embeddings).

Deterministic (md5 arithmetic only). Usage:
    python scripts/make_skew_docs.py [src_dir] [out_dir]
(defaults: .benchdata/sf10 -> .benchdata/sf10_zipfdoc)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.make_scale_data import _ALPHA, cipher  # noqa: E402

_REP_MAX = 8
_BOILER_MOD = 200  # 1 in 200 docs carries the template

# ~1.6k chars of fixed template — long relative to a ~300-char doc, so
# template shingles dominate the carrier docs' signatures.
_BOILER = " ".join(
    f"boilerplate navigation section {i} accept cookies privacy policy "
    f"terms of service subscribe newsletter follow social share"
    for i in range(16)
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf10"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".benchdata", "sf10_zipfdoc"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    parts = ", ".join(
        f"CASE WHEN rep > {j} THEN ' ' || "
        + ("text" if j == 0
           else f"translate(text, '{_ALPHA}', '{cipher(j)}')")
        + " ELSE '' END"
        for j in range(_REP_MAX)
    )
    con.execute(f"""
        COPY (
          SELECT doc_id,
                 trim(concat({parts})
                      || CASE WHEN doc_id % {_BOILER_MOD} = 0
                              THEN ' ' || '{_BOILER}' ELSE '' END) AS text,
                 lang, source,
                 length(trim(concat({parts})
                      || CASE WHEN doc_id % {_BOILER_MOD} = 0
                              THEN ' ' || '{_BOILER}' ELSE '' END))
                   AS n_chars
          FROM (
            SELECT *,
                   CAST(floor(exp(
                     (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'len'), 1, 12))
                           AS BIGINT) / 281474976710656.0) * ln({_REP_MAX})
                   )) AS BIGINT) AS rep
            FROM read_parquet('{src}/documents.parquet')
          )
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    for t in ("embeddings", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        sp = os.path.join(src, f"{t}.parquet")
        op = os.path.join(out, f"{t}.parquet")
        if os.path.exists(sp) and not os.path.exists(op):
            os.symlink(sp, op)
    stats = con.execute(f"""
        SELECT COUNT(*), AVG(length(text)), MAX(length(text)),
               SUM(CASE WHEN doc_id % {_BOILER_MOD} = 0 THEN 1 ELSE 0 END)
        FROM read_parquet('{out}/documents.parquet')
    """).fetchone()
    print("docs, avg_len, max_len, boiler_docs:", stats)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
