"""CCA loss vs a pure-numpy golden; sink round-trips (S5/S6/S10)."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.arrays import slice_features, to_double
from ae_data_integration_spark.operators.cca import cca_loss
from ae_data_integration_spark.sources.matrix_io import (
    read_results_json,
    write_parquet,
    write_tsv,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE


def test_cca_loss_matches_numpy(spark):
    e = table(spark, SF_SMOKE, "embeddings").limit(200)
    df = e.select(
        slice_features(to_double("embedding"), 1, 8).alias("features_v1"),
        slice_features(to_double("embedding"), 33, 8).alias("features_v2"),
    )
    got = cca_loss(df, reg=1e-3)

    pdf = df.toPandas()
    x1 = np.stack(pdf["features_v1"].to_numpy())
    x2 = np.stack(pdf["features_v2"].to_numpy())
    n = len(x1)
    x1c, x2c = x1 - x1.mean(0), x2 - x2.mean(0)
    # unbiased 1/(n-1) covariances, matching operators/cca.py:73-75
    # (ref Simulation_Auxiliary/objectives.py:36-40)
    s11 = x1c.T @ x1c / (n - 1) + 1e-3 * np.eye(8)
    s22 = x2c.T @ x2c / (n - 1) + 1e-3 * np.eye(8)
    s12 = x1c.T @ x2c / (n - 1)

    def inv_sqrt(m):
        w, v = np.linalg.eigh(m)
        return v @ np.diag(np.maximum(w, 1e-12) ** -0.5) @ v.T

    t = inv_sqrt(s11) @ s12 @ inv_sqrt(s22)
    want = -np.linalg.svd(t, compute_uv=False).sum()
    # fixed-point covariance quantization: agreement to ~1e-8
    assert got == pytest.approx(want, abs=1e-6)


def test_tsv_sink_roundtrip(spark, tmp_path):
    df = table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_tsv")
    write_tsv(df, path, mode="overwrite")
    back = (
        spark.read.option("sep", "\t").option("header", True)
        .option("inferSchema", True).csv(path)
    )
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in df.collect()
    )


def test_json_scan(spark, tmp_path):
    p = tmp_path / "metrics.json"
    p.write_text(json.dumps({"model": "CNC", "nmi": [0.1, 0.2], "acc": 0.9}))
    df = read_results_json(spark, str(p))
    row = df.first()
    assert row["model"] == "CNC" and row["acc"] == 0.9 and list(row["nmi"]) == [0.1, 0.2]


def test_parquet_sink_roundtrip(spark, tmp_path):
    df = table(spark, SF_SMOKE, "embeddings").limit(20)
    path = str(tmp_path / "emb.parquet")
    write_parquet(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 20
    assert set(back.columns) == set(df.columns)
