"""Portable exact aggregation: fixed-point sums.

Problem: a groupBy SUM over doubles is partition-order dependent, and
the obvious fix — casting to decimal — is NOT engine-portable: Spark
converts double→decimal via the shortest decimal repr
(BigDecimal.valueOf), DuckDB via a 10^scale multiply, and the two
disagree in the tail (measured: 0.03% of adversarial values at scale
13, 11% at scale 18 — ae_data_integration_spark stress test).

Fix: quantize to a POWER-OF-TWO grid in double space. x * 2^k is an
exact IEEE operation (exponent shift), round() rounds halves away
from zero in both engines, the integral result casts to bigint
exactly, and integer sums commute. Both engines therefore produce
bit-identical sums under any partitioning / evaluation order.

Range contract: |x| * 2^k * n_rows must stay below 2^63 (the helpers
document per-call bounds). At genuinely unbounded scale, split the
sum hierarchically or accept Spark-side decimal (no oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ~1e-6 grid for money-scale values (|x| ≤ ~1e5, rows ≤ ~1e8).
Q20 = 1 << 20
# ~1e-9 grid for O(1e3) analytic values with larger row counts.
Q30 = 1 << 30
# ~1e-12 grid for O(1) analytic values (|x| ≤ ~1e3, rows ≤ ~1e6).
Q40 = 1 << 40


def fp(col: Column | str, q: int) -> Column:
    """Quantized bigint representation round(x * q)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col * F.lit(q)).cast("long")


def fpsum(col: Column | str, q: int) -> Column:
    """Order-independent, engine-portable sum of doubles."""
    return F.sum(fp(col, q)) / F.lit(float(q))


def fpavg(col: Column | str, q: int) -> Column:
    """Portable mean: quantized sum over exact count."""
    return fpsum(col, q) / F.count(F.lit(1)).cast("double")


def fpsum_sql(expr: str, q: int) -> str:
    """DuckDB fragment mirroring fpsum bit-for-bit."""
    return f"(SUM(CAST(round(({expr}) * {q}) AS BIGINT)) / {q}.0)"


def np_round_half_away(x):
    """numpy twin of Spark/DuckDB round(): ties away from zero.

    np.rint is ties-to-even, so an Arrow kernel using it deviates by
    one grid step from the relational/oracle plan whenever a value
    lands EXACTLY on .5 of the quantization grid — rare per value but
    expected at production widths (~1e9 roundings per report run), and
    a near-tied argmax downstream can flip. trunc(x + copysign(.5, x))
    is the exact half-away-from-zero rule both engines implement.
    Returns int64.
    """
    import numpy as np

    return np.trunc(x + np.copysign(0.5, x)).astype(np.int64)


def fpavg_sql(expr: str, q: int) -> str:
    return f"({fpsum_sql(expr, q)} / CAST(COUNT(*) AS DOUBLE))"
