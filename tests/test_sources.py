"""Sources layer: matrix TSV ingestion + transpose round-trip
(SURVEY S1/S2/P1/P2), verified against a pandas .T golden."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ae_data_integration_spark.sources.matrix_io import (
    align_views,
    assert_aligned,
    derive_labels,
    long_to_wide,
    read_matrix_long,
    read_matrix_wide,
)


@pytest.fixture(scope="module")
def matrix_tsv(tmp_path_factory):
    """features×samples TSV shaped like Simulation_Data/*.csv."""
    tmp = tmp_path_factory.mktemp("omics")
    samples = [f"Group{g}.Time{t}.Rep{r}" for g in (1, 2) for t in (1, 2) for r in (1, 2)]
    feats = [f"feat-{i}" for i in range(10)]
    data = {s: [round(0.1 * i + j, 3) for i in range(10)] for j, s in enumerate(samples)}
    pdf = pd.DataFrame(data, index=feats)
    path = tmp / "mat.tsv"
    pdf.to_csv(path, sep="\t", index_label="feature")
    return str(path), pdf


def test_matrix_transpose_matches_pandas(spark, matrix_tsv):
    path, pdf = matrix_tsv
    wide = read_matrix_wide(spark, path).toPandas().set_index("sample_id")
    want = pdf.T  # the reference's read_csv(...).T
    assert set(wide.index) == set(want.index)
    for s in want.index:
        assert list(wide.loc[s, "features"]) == list(want.loc[s].to_numpy())


def test_long_form_columns(spark, matrix_tsv):
    path, pdf = matrix_tsv
    long = read_matrix_long(spark, path)
    assert set(long.columns) == {"sample_id", "feature_id", "feature_idx", "value"}
    assert long.count() == pdf.shape[0] * pdf.shape[1]


def test_label_derivation(spark, matrix_tsv):
    path, _ = matrix_tsv
    wide = derive_labels(read_matrix_wide(spark, path))
    labels = {r["label"] for r in wide.select("label").distinct().collect()}
    assert labels == {"Group1", "Group2"}


def test_alignment_gate(spark, matrix_tsv):
    path, _ = matrix_tsv
    v = read_matrix_wide(spark, path)
    assert_aligned(v, v)  # self-aligned passes
    joined = align_views(v, v)
    assert joined.columns == ["sample_id", "features_v1", "features_v2"]
    bad = v.filter(F.col("sample_id") != "Group1.Time1.Rep1")
    with pytest.raises(ValueError, match="misaligned"):
        assert_aligned(v, bad)


def test_long_to_wide_orders_by_feature_idx(spark):
    rows = [("s1", 2, 30.0), ("s1", 0, 10.0), ("s1", 1, 20.0)]
    long = spark.createDataFrame(rows, "sample_id string, feature_idx long, value double")
    wide = long_to_wide(long).collect()
    assert wide[0]["features"] == [10.0, 20.0, 30.0]
