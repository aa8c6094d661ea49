"""Property tests for the engine's portability bedrock: the
fixed-point sum discipline (functions/portable.py) and the md5
pseudo-randomness (functions/hashing.py) must agree with DuckDB
BIT-FOR-BIT on arbitrary inputs — not just on the testdata
distributions the parity suite exercises.

hypothesis drives the value generation; each property materializes
ONE batch of examples as a Spark DataFrame and a DuckDB relation over
the identical pandas frame, so the comparison covers the same
engine-boundary the oracle gate does. Adversarial cases are seeded
explicitly: exact .5 rounding ties on the quantization grid (where a
HALF_UP vs HALF_EVEN divergence would first appear), negative zeros,
denormal-adjacent magnitudes, and huge-but-in-contract values.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ae_data_integration_spark.functions.portable import Q20, Q30, fpsum, fpsum_sql

# exact ties on the Q20 grid: (k + 0.5) / Q20 is exactly representable
# (denominator a power of two), so round(x * Q20) sees a true .5
_TIES_Q20 = [(k + 0.5) / Q20 for k in (-3, -2, -1, 0, 1, 2, 7)]
_EDGES = [-0.0, 0.0, 1e-300, -1e-300, 12345.6789, -99999.125] + _TIES_Q20


def _duck_fpsum(vals: list[float], q: int) -> float:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": pd.Series(vals, dtype="float64")}))
    out = con.execute(f"SELECT {fpsum_sql('x', q)} AS s FROM t").fetchone()[0]
    con.close()
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.floats(min_value=-1e5, max_value=1e5,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    )
)
def test_fpsum_bit_equal_across_engines(spark, vals):
    """Spark fpsum == DuckDB fpsum_sql on arbitrary in-contract
    doubles, including injected rounding-tie and signed-zero edges.
    Zero tolerance: the oracle gate compares these values exactly."""
    vals = vals + _EDGES
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = sdf.agg(fpsum("x", Q20).alias("s")).first()["s"]
    want = _duck_fpsum(vals, Q20)
    assert got == want, (got, want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    ),
    st.integers(min_value=2, max_value=9),
)
def test_fpsum_partition_count_invariant(spark, vals, nparts):
    """The quantized sum must not depend on partitioning — integer
    addition commutes where double addition would not."""
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    a = sdf.agg(fpsum("x", Q30).alias("s")).first()["s"]
    b = sdf.repartition(nparts).agg(fpsum("x", Q30).alias("s")).first()["s"]
    assert a == b


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=24,
            ),
        ),
        min_size=1, max_size=30, unique=True,
    )
)
def test_md5_randomness_bit_equal_across_engines(spark, keys):
    """md5_bucket / md5_unit — the engine's seeded randomness — must
    be replayed bit-for-bit by DuckDB for arbitrary keys (ints and
    printable strings), exactly as the split/sample oracles assume."""
    from ae_data_integration_spark.functions.hashing import md5_bucket, md5_unit

    keys = [str(k) for k in keys]
    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: (r["b"], r["u"])
        for r in sdf.select(
            "k",
            md5_bucket("k", 7, salt="s:").alias("b"),
            md5_unit("k", salt="s:").alias("u"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": pd.Series(keys, dtype="string")}))
    want = {
        k: (b, u)
        for k, b, u in con.execute(
            "SELECT k,"
            " CAST(('0x' || substr(md5('s:' || k), 1, 12)) AS BIGINT) % 7 AS b,"
            " CAST(('0x' || substr(md5('s:' || k), 1, 12)) AS BIGINT)"
            "   / 281474976710656.0 AS u "
            "FROM t"
        ).fetchall()
    }
    con.close()
    assert got == want


def test_fpsum_tie_rounding_is_half_away_from_zero(spark):
    """Pin the tie-break convention itself: +x.5 rounds up, -x.5
    rounds away from zero, in BOTH engines (a silent HALF_EVEN would
    flip alternating grid points and desynchronize every oracle)."""
    ties = [(2.5 / Q20,), (-2.5 / Q20,), (3.5 / Q20,), (-3.5 / Q20,)]
    sdf = spark.createDataFrame(ties, "x double")
    rows = sorted(
        (r["s"] for r in sdf.groupBy("x").agg(fpsum("x", Q20).alias("s")).collect())
    )
    want_vals = sorted([3 / Q20, -3 / Q20, 4 / Q20, -4 / Q20])
    assert rows == pytest.approx(want_vals, abs=0.0)
    for v in (2.5, -2.5, 3.5, -3.5):
        duck = _duck_fpsum([v / Q20], Q20)
        expect = (4 if abs(v) == 3.5 else 3) / Q20 * (1 if v > 0 else -1)
        assert duck == expect
