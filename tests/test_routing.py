"""Round-8 hardening: shared wide-routing rule, half-away-from-zero
Arrow rounding, tracked persists, degenerate-fold NB parity, ragged
matrix rows (VERDICT r7 task 3 + all five ADVICE items)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.portable import np_round_half_away
from ae_data_integration_spark.functions.routing import (
    WIDE_THRESHOLD,
    route_wide,
    vec_width,
)

# --- rounding: the cross-engine ties contract --------------------------------

# exact halves + near-halves + signs; np.rint (ties-to-even) disagrees
# on every odd half below.
HALF_CASES = [0.5, 1.5, 2.5, 3.5, -0.5, -1.5, -2.5, 0.49, -0.49, 2.0, -7.0, 0.0]
HALF_EXPECT = [1, 2, 3, 4, -1, -2, -3, 0, 0, 2, -7, 0]


def test_np_round_half_away_exact_halves():
    got = np_round_half_away(np.array(HALF_CASES))
    assert got.tolist() == HALF_EXPECT
    assert got.dtype == np.int64
    # and np.rint would NOT match (the round-7 advisor finding): odd
    # halves go to even under rint
    assert np.rint(np.array(HALF_CASES)).astype(np.int64).tolist() != HALF_EXPECT


def test_np_round_half_away_matches_spark_round(spark):
    df = spark.createDataFrame([(float(x),) for x in HALF_CASES], "x double")
    got = [
        r["r"]
        for r in df.select(F.round("x").cast("long").alias("r")).collect()
    ]
    assert got == HALF_EXPECT


def test_np_round_half_away_matches_duckdb_round():
    con = duckdb.connect()
    got = [
        con.execute(f"SELECT CAST(round({x!r}) AS BIGINT)").fetchone()[0]
        for x in HALF_CASES
    ]
    assert got == HALF_EXPECT


def test_half_away_on_quantized_grid():
    # the kernels round ll*Q30 terms: make a value land EXACTLY on .5
    # of the integer grid and check the helper stays on the Spark/
    # DuckDB side of the tie (rint goes to even = one grid step off)
    q = float(1 << 30)
    x = np.array([2.5 / q, -2.5 / q, 7.5 / q]) * q  # exact halves again
    assert np_round_half_away(x).tolist() == [3, -3, 8]
    assert np.rint(x).astype(np.int64).tolist() == [2, -2, 8]


# --- route_wide: one rule, both callers --------------------------------------


def test_route_wide_explicit_dim_skips_probe(spark):
    # dim= must decide WITHOUT touching the DataFrame: hand route_wide
    # a df whose probe would give the OPPOSITE answer.
    narrow = spark.createDataFrame([Row(v=[1.0] * 4)])
    assert route_wide(narrow, "v", dim=WIDE_THRESHOLD + 1) is True
    wide = spark.createDataFrame([Row(v=[1.0] * (WIDE_THRESHOLD + 10))])
    assert route_wide(wide, "v", dim=4) is False


def test_route_wide_threshold_is_strict():
    class Boom:  # df must not be touched when dim is given
        def __getattr__(self, name):  # pragma: no cover - fails loudly
            raise AssertionError("route_wide probed despite explicit dim")

    assert route_wide(Boom(), "v", dim=WIDE_THRESHOLD) is False
    assert route_wide(Boom(), "v", dim=WIDE_THRESHOLD + 1) is True
    assert route_wide(Boom(), "v", threshold=8, dim=8) is False
    assert route_wide(Boom(), "v", threshold=8, dim=9) is True


def test_route_wide_probe_null_and_ragged_safe(spark):
    # a null/short LEADING vector must not misroute (the old first()-
    # based probe did): max-over-sample sees the wide rows.
    rows = [Row(v=None), Row(v=[1.0] * 3), Row(v=[1.0] * (WIDE_THRESHOLD + 5))]
    df = spark.createDataFrame(rows, "v array<double>").coalesce(1)
    assert vec_width(df, "v") == WIDE_THRESHOLD + 5
    assert route_wide(df, "v") is True


def test_route_wide_all_null_or_empty_routes_relational(spark):
    nulls = spark.createDataFrame([Row(v=None)] * 3, "v array<double>")
    assert route_wide(nulls, "v") is False
    empty = spark.createDataFrame([], "v array<double>")
    assert route_wide(empty, "v") is False


def test_nb_auto_routing_uses_shared_rule(spark):
    """scorer='auto' routes narrow→relational, wide→arrow, and the
    two scorers agree bit-for-bit on the same input either way."""
    from ae_data_integration_spark.operators.nb import gaussian_nb_cv_accuracy

    rows = [
        Row(vec_id=i, label=i % 3, embedding=[float((i * 7 + j) % 11) for j in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    rel = gaussian_nb_cv_accuracy(df, "vec_id", "label", "embedding",
                                  scorer="relational").collect()
    auto = gaussian_nb_cv_accuracy(df, "vec_id", "label", "embedding",
                                   scorer="auto").collect()
    arrow = gaussian_nb_cv_accuracy(df, "vec_id", "label", "embedding",
                                    scorer="arrow").collect()
    assert [r.asDict() for r in auto] == [r.asDict() for r in rel]
    assert [r.asDict() for r in arrow] == [r.asDict() for r in rel]
    # dim passthrough forces the arrow path without a probe job
    forced = gaussian_nb_cv_accuracy(df, "vec_id", "label", "embedding",
                                     scorer="auto", dim=512).collect()
    assert [r.asDict() for r in forced] == [r.asDict() for r in rel]


def test_mlp_forward_routing(spark):
    from ae_data_integration_spark.catalog.linalg_q import mlp_forward

    sf = "/root/testdata/sf0.001"
    rel = mlp_forward(spark, sf, path="relational").limit(40).collect()
    arrow = mlp_forward(spark, sf, path="arrow").limit(40).collect()
    auto = mlp_forward(spark, sf, path="auto").limit(40).collect()
    assert [r.asDict() for r in arrow] == [r.asDict() for r in rel]
    assert [r.asDict() for r in auto] == [r.asDict() for r in rel]
    with pytest.raises(ValueError):
        mlp_forward(spark, sf, path="bogus")


# --- degenerate fold: wide scorer must match relational, not crash -----------


def test_nb_wide_scorer_fold_without_training_rows(spark):
    # ONE row: its fold has a test row but zero training rows anywhere
    # → the model for that fold is empty. The relational path emits no
    # predictions; the Arrow kernel previously raised KeyError.
    from ae_data_integration_spark.operators.nb import (
        gaussian_nb_cv_accuracy,
        gaussian_nb_cv_accuracy_wide,
    )

    df = spark.createDataFrame([Row(vec_id=1, label=0, embedding=[1.0, 2.0])])
    rel = gaussian_nb_cv_accuracy(df, "vec_id", "label", "embedding",
                                  scorer="relational").collect()
    wide = gaussian_nb_cv_accuracy_wide(df, "vec_id", "label", "embedding").collect()
    assert rel == []
    assert wide == []


# --- tracked persists: reuse without shared-JVM accumulation -----------------


def test_persist_tracked_released_after_materialize(spark):
    from ae_data_integration_spark.functions.caching import (
        persist_tracked,
        release_tracked,
    )

    release_tracked()  # drain anything earlier tests left
    df = persist_tracked(spark.range(100).groupBy((F.col("id") % 7).alias("k")).count())
    assert df.count() == 7
    assert df.storageLevel.useMemory
    assert release_tracked() == 1
    assert not df.storageLevel.useMemory
    assert release_tracked() == 0


def test_q15_q11_leave_no_cache_behind(spark):
    from ae_data_integration_spark.catalog import load_all
    from ae_data_integration_spark.functions.caching import release_tracked

    release_tracked()
    reg = load_all()
    sf = "/root/testdata/sf0.001"
    reg["q15_top_supplier"].fn(spark, sf).collect()
    reg["q11_important_parts"].fn(spark, sf).collect()
    # both queries tracked exactly one persisted intermediate each
    assert release_tracked() == 2


# --- ragged matrix rows: NULL-pad, never silently drop samples ---------------


def test_matrix_melt_pads_ragged_rows(spark, tmp_path):
    from ae_data_integration_spark.sources.matrix_io import read_matrix_long

    p = tmp_path / "ragged.tsv"
    p.write_text(
        "feature\ts1\ts2\ts3\n"
        "g0\t1.0\t2.0\t3.0\n"
        "g1\t4.0\t5.0\n"  # ragged: missing s3
        "g2\t6.0\t7.0\t8.0\t9.0\n"  # extra field beyond header: ignored
    )
    out = read_matrix_long(spark, str(p)).collect()
    by_key = {(r["feature_id"], r["sample_id"]): r["value"] for r in out}
    # every (feature, sample) cell exists — 3 features × 3 samples
    assert len(out) == 9
    assert by_key[("g1", "s1")] == 4.0
    assert by_key[("g1", "s2")] == 5.0
    assert by_key[("g1", "s3")] is None  # padded, not dropped
    assert by_key[("g2", "s3")] == 8.0
