#!/usr/bin/env python3
"""Generate a 10x-scaled copy of the sf0.1 testdata ("sf1") for the
bench's scale-growth leg, under .benchdata/sf1 (gitignored).

Replication preserves the star schema's referential integrity: every
fact table is replicated 10x with each key domain shifted by
i * (max_key + 1), so joins fan out exactly as they would on 10x real
data (no accidental key collisions, no broken FKs). Dimension tables
(region, nation) stay as-is — at any scale they remain broadcast-side.

Two deliberate perturbations keep SIMILARITY semantics comparable
across scales (without them, every replica would be a byte-identical
near-duplicate of the original, and LSH bucket joins would grow
quadratically in the replication factor — a data artifact, not an
engine property):
- documents.text goes through a per-replica CHARACTER ROTATION (a
  bijection on [a-z], caesar-style): shingle sets map bijectively, so
  intra-replica Jaccard/minhash/near-dup structure is EXACTLY the
  original corpus's, while cross-replica shingle sets are disjoint.
  (A suffix token instead leaves cross-replica Jaccard ~1: every text
  then has 10 near-copies, LSH buckets grow 10x, and the bucketed
  dedup join inflates ~replication^2 — a data artifact the round-6
  scale leg caught as a 19.9x growth ratio.)
- embeddings get a per-replica md5-derived coordinate SIGN-FLIP
  pattern: intra-replica norms, pairwise cosines, and distances are
  EXACTLY preserved (dot(s.a, s.b) = dot(a, b) for a shared flip
  pattern s), while cross-replica cosines decorrelate to ~0 — so
  near-dup/ANN/DBSCAN structure per replica matches the original
  corpus and nothing quadratic appears across replicas. (A naive
  +offset shift instead makes every vector in a replica point the
  same way: all-pairs cosine ~0.99, one LSH bucket per replica, and
  any near-dup screen is forced quadratic — a data artifact this
  generator must not create.)

Deterministic (pure arithmetic over the seeded source data).
Usage: python scripts/make_scale_data.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(REPO, ".benchdata", "sf1")

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def cipher(i: int) -> str:
    """Replica i's substitution alphabet: a full md5-ranked permutation
    of [a-z] (portable, no RNG state). A bijection on characters maps
    word/shingle sets bijectively (intra-replica Jaccard preserved
    exactly) and is distinct for EVERY replica — unlike the caesar
    shift this replaced, which repeated every 26 replicas and made
    factor>26 corpora carry byte-identical cross-replica duplicates
    (tests/test_scale_generator.py)."""
    import hashlib

    return "".join(sorted(
        _ALPHA, key=lambda c: hashlib.md5(f"perm{i}:{c}".encode()).hexdigest()
    ))


def generate(src: str = DEFAULT_SRC, out: str = DEFAULT_OUT, factor: int = 10,
             tables: tuple[str, ...] | None = None) -> str:
    """``tables=None`` generates the full star schema. A subset (e.g.
    ("documents", "embeddings") for the third-decade 1000x spot-leg,
    whose three queries touch only the corpus tables) skips the rest —
    at factor 1000 the full schema would be ~17 GB dominated by a
    600M-row lineitem no 1000x query reads."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def rp(t: str) -> str:
        return f"read_parquet('{os.path.join(src, t)}.parquet')"

    def copy(t: str, select_sql: str) -> None:
        if tables is not None and t not in tables:
            return
        con.execute(
            f"COPY ({select_sql}) TO '{os.path.join(out, t)}.parquet' (FORMAT PARQUET)"
        )

    def key_span(t: str, col: str) -> int:
        return con.execute(f"SELECT MAX({col}) + 1 FROM {rp(t)}").fetchone()[0]

    c_span = key_span("customer", "c_custkey")
    s_span = key_span("supplier", "s_suppkey")
    p_span = key_span("part", "p_partkey")
    o_span = key_span("orders", "o_orderkey")
    e_span = key_span("events", "event_id")
    u_span = key_span("events", "user_id")
    d_span = key_span("documents", "doc_id")
    v_span = key_span("embeddings", "vec_id")
    reps = f"(SELECT unnest(range({factor})) AS i)"

    # dimensions: pass through unchanged
    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM {rp(t)}")

    # Names are re-derived from the shifted key (the source data's own
    # convention: 'Customer#%09d'). Passing names through unchanged
    # would give every name `factor` exact copies — deletion-
    # neighborhood linkage (er1) blocks would then grow ~factor^2, a
    # data artifact of the same family as the documents/embeddings
    # perturbations this generator exists to avoid.
    copy("customer", f"""
        SELECT c_custkey + i * {c_span} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + i * {c_span} AS VARCHAR), 9, '0')
                 AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {rp('customer')}, {reps}""")
    copy("supplier", f"""
        SELECT s_suppkey + i * {s_span} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + i * {s_span} AS VARCHAR), 9, '0')
                 AS s_name,
               s_nationkey, s_acctbal
        FROM {rp('supplier')}, {reps}""")
    copy("part", f"""
        SELECT p_partkey + i * {p_span} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {rp('part')}, {reps}""")
    copy("orders", f"""
        SELECT o_orderkey + i * {o_span} AS o_orderkey,
               o_custkey + i * {c_span} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {rp('orders')}, {reps}""")
    copy("lineitem", f"""
        SELECT l_orderkey + i * {o_span} AS l_orderkey,
               l_partkey + i * {p_span} AS l_partkey,
               l_suppkey + i * {s_span} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {rp('lineitem')}, {reps}""")
    copy("events", f"""
        SELECT event_id + i * {e_span} AS event_id, ts,
               user_id + i * {u_span} AS user_id,
               event_type, value, props
        FROM {rp('events')}, {reps}""")
    # Per-replica SUBSTITUTION CIPHER (full md5-seeded permutation of
    # [a-z]), not a caesar shift: caesar has only 25 distinct
    # non-identity rotations, so at factor > 26 replicas 26 apart got
    # byte-identical texts — every doc acquired exact cross-replica
    # duplicates and any dedup op inflated quadratically (the same
    # class of data artifact the round-6 docstring warns about). A
    # permutation is still a bijection on characters, so word/shingle
    # sets map bijectively and intra-replica Jaccard/minhash structure
    # stays EXACTLY the original corpus's at any factor.
    rot_cases = " ".join(
        f"WHEN {i} THEN translate(text, '{_ALPHA}', '{cipher(i)}')"
        for i in range(1, factor)
    )
    copy("documents", f"""
        SELECT doc_id + i * {d_span} AS doc_id,
               CASE i WHEN 0 THEN text {rot_cases} ELSE text END AS text,
               lang, source, n_chars
        FROM {rp('documents')}, {reps}""")
    # sign(i, d) = +1 / -1 from md5('rep{i}:{d}') parity; i=0 keeps the
    # original vectors bit-for-bit (all +1).
    flip = (
        "CASE WHEN i = 0 THEN embedding ELSE "
        "list_transform(list_zip(embedding, range(0, 64)), p -> "
        "CAST(p[1] * (CASE WHEN CAST(('0x' || substr(md5('rep' || CAST(i AS VARCHAR)"
        " || ':' || CAST(p[2] AS VARCHAR)), 1, 2)) AS INT) % 2 = 0"
        " THEN 1 ELSE -1 END) AS FLOAT)) END"
    )
    copy("embeddings", f"""
        SELECT vec_id + i * {v_span} AS vec_id,
               {flip} AS embedding,
               label
        FROM {rp('embeddings')}, {reps}""")
    con.close()
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    print(generate(src, out, factor, tables=tables))
