"""As-of (backward) join — a custom operator Spark lacks natively.

Semantics: for every left row, attach the value columns of the most
recent right row with the same key and right.ts ≤ left.ts (strict:
< left.ts). The classic implementations are a range join (explodes
under Catalyst into an O(N·M) broadcast-nested-loop) or a
sort-merge-with-cursor (not expressible declaratively); the scalable
relational form used here is the UNION + LAST(IGNORE NULLS) trick:

  tag right rows, union with left, window per key ordered by
  (ts, side, seq), take last(value, ignorenulls) over the preceding
  frame. ONE hash shuffle on the key + a per-key sort — exactly the
  shuffle a sort-merge as-of join would pay, expressed entirely in
  built-in operators (Catalyst window, no UDFs), and both engines
  replay it bit-identically (the picked value is copied, not
  aggregated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    seq_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join; returns left's columns + ``asof_<v>`` for
    each value column (null when no prior right row exists).

    ``seq_col`` breaks ties among right rows sharing (key, ts) —
    required for determinism when such ties are possible.
    """
    ldt = dict(left.dtypes)
    rdt = dict(right.dtypes)
    lcols = left.columns

    seq = (
        F.col(seq_col)
        if seq_col is not None
        else F.lit(0)
    )
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        (seq if seq_col in lcols else F.lit(0)).cast("long").alias("_seq"),
        *[F.lit(None).cast(rdt[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(ldt[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        (seq if seq_col in right.columns else F.lit(0)).cast("long").alias("_seq"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    # Non-strict: right rows at equal ts sort BEFORE the left row (side
    # 0 < 1) and are visible; strict: after (excluded). Left rows carry
    # null _r_* values, so including the current row is always safe.
    side_order = F.col("_side") if not strict else (F.lit(1) - F.col("_side"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), side_order, F.col("_seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in value_cols
    ]
    return (
        u.select(*lcols, "_side", *picked)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
