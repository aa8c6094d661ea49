"""Data-layout writers: how a 100 TB corpus should land on disk.

At cluster scale the dominant cost of most queries is the scan, and
the scan cost is set by LAYOUT, not by the query planner:

- **Hive-partitioned** directories (`partitionBy`) turn equality /
  range predicates on the partition column into directory pruning —
  the files are never opened (plan shows them under PartitionFilters).
- **Sort-within-partitions** tightens per-file and per-rowgroup
  min/max statistics on the sort key, so parquet readers skip row
  groups even inside surviving partitions.
- **Z-order clustering** interleaves the bits of several keys into
  one sort key, so files stay narrow in EVERY clustered dimension at
  once — the multi-column generalization of a plain sort (a plain
  sort makes files narrow in the first key and WIDE in the rest).

The Z-order here is the standard fixed-width bit-interleave over
min/max-normalized keys, built from JVM expressions only (shiftleft /
bitwise-or folds — no UDFs), computed in one pass plus a tiny stats
agg. Files are then formed by `repartitionByRange` on the z-key, so
each output file covers a contiguous z-range = a small axis-aligned
box in key space. Effectiveness is asserted in
tests/test_layout.py by measuring per-file key spans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZBITS = 16


def zorder_key(df: DataFrame, cols: list[str], bits: int = _ZBITS) -> Column:
    """Z-order (Morton) key over numeric columns: each key is scaled
    to an unsigned ``bits``-bit integer by its global min/max (one
    cheap stats agg, broadcast as plan literals), then the bits are
    interleaved MSB-first. Pure JVM expressions — codegen'd, no
    shuffle beyond the stats agg."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    scaled = []
    for c in cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(1 << bits)),
        ).cast("long")
        scaled.append(q)
    # Interleave MSB-first: output bit (bits-1-b)*n + lane for bit b.
    n = len(cols)
    parts = [
        F.shiftleft(
            F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + (n - 1 - lane)
        )
        for b in range(bits)
        for lane, s in enumerate(scaled)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), parts).alias("zkey")


def write_clustered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    partition_by: list[str] | None = None,
) -> None:
    """Write parquet clustered for scan-time skipping: optional hive
    partitioning on low-cardinality columns + Z-order file clustering
    on the high-cardinality predicate columns.

    ``repartitionByRange(zkey)`` makes each task (→ file) own a
    contiguous z-range; the within-partition sort tightens rowgroup
    stats further. At 100 TB, ``n_files`` becomes files-per-partition
    sized to ~1 GB each."""
    keyed = df.withColumn("zkey", zorder_key(df, zorder_cols))
    out = (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write with optional within-partition
    sort (directory pruning + rowgroup-stat skipping)."""
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
