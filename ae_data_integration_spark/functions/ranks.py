"""Distributed exact order statistics — the k-th element of a total
order without a single-partition window.

The obvious `row_number() OVER (ORDER BY ...)` funnels the whole
table through ONE task (Spark plans a global window as a 1-partition
exchange), which is the classic scale cliff for "exact corpus
quantile" requirements. This helper keeps the standard distributed
shape instead:

1. range-shuffle sort (`orderBy` — Spark's range partitioner keeps
   ascending key ranges in ascending partition ids), materialized
   once with ``localCheckpoint`` so the two follow-up jobs read the
   SAME partitioning;
2. one model-sized collect of per-partition (row count, min row id)
   aggregates — ≤ ``spark.sql.shuffle.partitions`` rows — from which
   the driver computes each requested global rank's (partition,
   local offset) coordinate;
3. one direct id-filter job fetching exactly the requested rows.

``monotonically_increasing_id`` on the materialized sort is
``partition_base + local_index`` with consecutive local indices; we
do NOT trust that silently — the same per-partition aggregate also
reads ``max(id)`` and the driver asserts ``max - min == count - 1``
for every partition, so a Spark-internal layout change fails loudly
instead of returning a wrong order statistic.

The returned VALUES are partition-independent (order statistics of a
total order), so a DuckDB oracle replays downstream classification
with a plain ``ntile()``/``row_number()`` while the engine never
global-sorts into one task. Used by the t23 perplexity terciles
(catalog/text_q.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def order_statistics(
    df: DataFrame,
    order_cols: list[str],
    ranks: list[int] | Callable[[int], list[int]],
) -> tuple[list[Row], int]:
    """Rows of ``df`` at the given 1-based global ranks under the
    total order ``order_cols`` (must be tie-free — end it with a
    unique key), plus the total row count.

    ``ranks`` may be a callable receiving the total row count N, for
    rank requests that depend on N (e.g. terciles ``ceil(N/3)``).
    Returns rows in the same order as the resolved rank list.
    """
    s = (
        df.orderBy(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    try:
        parts = (
            s.groupBy("_pid")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.min("_mid").alias("_lo"),
                F.max("_mid").alias("_hi"),
                # The TRUE per-partition minimum row under the total order:
                # min of the struct, not independent per-column minima —
                # per-column mins can invert across a tie on the leading key
                # (P_i={(x,400)}, P_{i+1}={(x,600),(y,1)} gives per-column
                # mins (x,400) > (x,1) and a spurious assert).
                F.min(F.struct(*[F.col(c) for c in order_cols])).alias("_kmin"),
            )
            .collect()
        )
        parts.sort(key=lambda r: r["_pid"])
        for r in parts:
            if r["_hi"] - r["_lo"] != r["_n"] - 1:
                raise AssertionError(
                    "monotonically_increasing_id is not consecutive within "
                    f"partition {r['_pid']}: ids span {r['_hi'] - r['_lo'] + 1} "
                    f"for {r['_n']} rows"
                )
        mins = [tuple(r["_kmin"]) for r in parts]
        if mins != sorted(mins):
            raise AssertionError(
                "range partitioning did not place ascending key ranges in "
                "ascending partition-id order"
            )
        n_total = sum(r["_n"] for r in parts)
        want = list(ranks(n_total)) if callable(ranks) else list(ranks)
        if not want:  # nothing requested: skip the fetch job outright
            return [], n_total
        targets: dict[int, int] = {}
        for rk in want:
            if not 1 <= rk <= n_total:
                raise IndexError(f"rank {rk} outside [1, {n_total}]")
            off = 0
            for r in parts:
                if rk <= off + r["_n"]:
                    targets[rk] = r["_lo"] + (rk - off - 1)
                    break
                off += r["_n"]
        by_mid = {
            row["_mid"]: row
            for row in s.filter(
                F.col("_mid").isin(sorted(set(targets.values())))
            ).collect()
        }
        return [by_mid[targets[rk]] for rk in want], n_total
    finally:
        s.unpersist()
