"""Model artifacts as data (SURVEY §2.1 S9).

The reference pickles whole torch modules (torch.save(model, ...),
CNC_AE_retraining.py:250-252) — load-bearingly fragile (evaluation
must re-import matching class defs, AE_results.ipynb cell 69). The
engine stores state-dict-shaped artifacts as a plain parquet table:

    (tensor_name string, shape array<int>, values array<double>)

plus a metadata row — engine-agnostic, schema-checked, diffable, and
readable by any engine (DuckDB included). Round-trips numpy weight
dicts bit-exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession


def save_weights(
    spark: SparkSession, weights: dict[str, np.ndarray], path: str,
    meta: dict[str, str] | None = None,
) -> None:
    rows = [
        (name, list(w.shape), [float(v) for v in w.ravel()])
        for name, w in sorted(weights.items())
    ]
    df = spark.createDataFrame(
        rows, "tensor_name string, shape array<int>, values array<double>"
    )
    if meta:
        meta_rows = [(f"__meta__/{k}", [0], [float(len(v))]) for k, v in meta.items()]
        df = df.union(
            spark.createDataFrame(
                meta_rows, "tensor_name string, shape array<int>, values array<double>"
            )
        )
    df.write.mode("overwrite").parquet(path)


def load_weights(spark: SparkSession, path: str) -> dict[str, np.ndarray]:
    rows = spark.read.parquet(path).collect()
    out: dict[str, np.ndarray] = {}
    for r in rows:
        if r["tensor_name"].startswith("__meta__/"):
            continue
        out[r["tensor_name"]] = np.array(r["values"], dtype=np.float64).reshape(
            r["shape"]
        )
    return out
