"""Relational-vs-Arrow routing for wide-vector operators.

Several operators ship TWO bit-equal physical plans over the same
logical spec: a fully SQL-replayable relational plan (explode +
broadcast join + quantized hash agg — the oracle-stable reference
plan) and a broadcast-model Arrow kernel (zero shuffle in the score/
forward pass — the scale plan). The relational form carries a
row-expansion scale term (×classes for NB scoring, ×hidden-width for
the MLP forward): at the 100× leg the measured crossover is dramatic
(NB 66.1 s relational vs 8.4 s Arrow on 6.4M×64-d rows; MLP 40.0 s vs
6.4 s), while at fixture widths the relational plan is at parity and
keeps the whole query inside whole-stage codegen.

This module is the ONE place that decision lives: width above
``WIDE_THRESHOLD`` routes to Arrow. 256 is the documented break-even
region — below it the ×classes/×hidden expansion stays within the
same order as the Arrow kernel's per-batch Python+Arrow overhead; the
reference's production widths (20,531 / 21,577) are two orders past
it, the fixtures (64-d) two orders under.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WIDE_THRESHOLD = 256


def vec_width(df: DataFrame, vec_col: str, sample: int = 64) -> int | None:
    """Probe the vector width with ONE bounded job: max(size) over a
    partition-prefix sample. Null-safe (max ignores null sizes) and
    ragged-safe (max, not first — a null/short leading vector cannot
    misroute). Returns None when the sample has no non-null vectors.

    Callers that already know the width (schema metadata, upstream
    contract) should pass it explicitly via route_wide(dim=...) and
    skip the job entirely.
    """
    row = (
        df.select(F.size(F.col(vec_col)).alias("_d"))
        .limit(sample)
        .agg(F.max("_d").alias("d"))
        .first()
    )
    d = row["d"] if row is not None else None
    return int(d) if d is not None and d >= 0 else None


def route_wide(
    df: DataFrame,
    vec_col: str,
    threshold: int = WIDE_THRESHOLD,
    dim: int | None = None,
) -> bool:
    """True → take the broadcast-model Arrow kernel; False → take the
    relational (oracle-reference) plan.

    ``dim`` short-circuits the probe when the caller knows the width
    (report_full knows d1/d2; catalog fixtures pin their plans and
    never call this). Unknown width (no non-null vectors in the
    probe sample) routes relational — the safe plan for empty/
    degenerate inputs.
    """
    d = dim if dim is not None else vec_width(df, vec_col)
    return d is not None and d > threshold
