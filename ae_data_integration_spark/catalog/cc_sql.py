"""Shared DuckDB CTE generator for the fixed-pass connected-components
unroll (min-label propagation with pointer jumping).

Replays `operators.dedup.dup_labels` step-for-step: each pass takes
the min label over neighbors (hop) then the label of the node named
by the current label (jump). Every step is integer mins over joins,
so the replay is bit-exact on any engine. Used by the d6/pipe2 dedup
oracles and the c2 DBSCAN fixpoint oracle.

The caller supplies a WITH-prefix `verified_cte` that must define a
relation ``verified(doc_a, doc_b)`` (the undirected edge list), and
optionally a `tail` that may reference ``l{n_iters}`` (final labels),
``edges``, and anything defined in the prefix.
"""

from __future__ import annotations


def cc_unrolled_sql(verified_cte: str, n_iters: int = 4, tail: str | None = None) -> str:
    steps = []
    prev = "l0"
    for i in range(1, n_iters + 1):
        # Each pass references the previous generation three times;
        # MATERIALIZED pins every generation to one evaluation (DuckDB
        # inlines multiply-referenced CTEs by default, which re-expands
        # the upstream edge pipeline ~3^n_iters times — the SQL twin of
        # the eager localCheckpoint in operators.dedup.dup_labels).
        steps.append(f"""n{i} AS (
  SELECT e.a AS id, MIN(x.lbl) AS nb
  FROM edges e JOIN {prev} x ON e.b = x.id GROUP BY e.a
),
h{i} AS (
  SELECT l.id, least(l.lbl, coalesce(n.nb, l.lbl)) AS lbl
  FROM {prev} l LEFT JOIN n{i} n ON l.id = n.id
),
l{i} AS MATERIALIZED (
  SELECT h.id, least(h.lbl, coalesce(j.l2, h.lbl)) AS lbl
  FROM h{i} h LEFT JOIN (SELECT id AS k, lbl AS l2 FROM {prev}) j ON h.lbl = j.k
)""")
        prev = f"l{i}"
    tail_sql = tail or (
        f"SELECT lbl AS cluster_root, COUNT(*) AS n_docs\n"
        f"FROM {prev} GROUP BY lbl ORDER BY cluster_root"
    )
    return f"""{verified_cte},
edges0 AS (SELECT doc_a AS a, doc_b AS b FROM verified),
edges AS MATERIALIZED (SELECT a, b FROM edges0 UNION SELECT b AS a, a AS b FROM edges0),
l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl FROM edges),
{",".join(steps)}
{tail_sql}"""
