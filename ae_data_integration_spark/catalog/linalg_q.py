"""Linear-algebra / model-layer queries (SURVEY §2.6, §2.7 A1, §2.8 C8).

l1_affine proves the relational decomposition of a Linear layer
(SURVEY L1: explode + weight join + sum-groupBy == xW+b) with
md5-derived weights both engines regenerate. a1_frobenius is the
reference's training objective as a global aggregate. The c8_*
queries run the real batched-inference bridge (numpy mapInPandas)
for every architecture — not SQL-expressible, so they are rows-only
checks here and golden-tested against a local numpy forward in
tests/test_inference.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.arrays import l2_normalize, slice_features, to_double
from ae_data_integration_spark.functions.hashing import md5_unit
from ae_data_integration_spark.functions.portable import Q40, fpsum, np_round_half_away
from ae_data_integration_spark.functions.routing import route_wide
from ae_data_integration_spark.models.specs import ARCHITECTURES
from ae_data_integration_spark.operators.inference import embed_and_recon
from ae_data_integration_spark.tables import table

_MD5U = "(CAST(('0x' || substr(md5({key}), 1, 12)) AS BIGINT) / 281474976710656.0)"

# Fixed-point quantum for the matmul partial sums. Double→decimal
# casts are NOT portable at high scales (Spark casts via shortest
# repr, DuckDB via the binary expansion — they disagree in the tail),
# so order-independent exact summation uses integers instead:
# round(p * 2^30) is computed on an EXACT power-of-two-scaled double,
# both engines round halves away from zero, and bigint sums commute.
_Q = 1 << 30

# --- L1: affine map, relationally -------------------------------------------

_L1_SQL = f"""
WITH w AS (
  SELECT i.i, j.j,
         {_MD5U.format(key="'w:' || i.i || ':' || j.j")} - 0.5 AS w
  FROM (SELECT unnest(range(0, 64)) AS i) i, (SELECT unnest(range(0, 8)) AS j) j
),
x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x
  FROM embeddings
),
s AS (
  SELECT x.vec_id, w.j,
         SUM(CAST(round(x.x * w.w * {_Q}) AS BIGINT)) / {_Q}.0 AS acc
  FROM x JOIN w ON x.i = w.i
  GROUP BY x.vec_id, w.j
)
SELECT vec_id, j AS out_dim,
       acc + ({_MD5U.format(key="'b:' || j")} - 0.5) AS y
FROM s
ORDER BY vec_id, out_dim
"""


@register("y_l1_affine_relational", oracle=_L1_SQL,
          doc="nn.Linear as explode + weight join + decimal sum-groupBy "
              "(SURVEY L1 relational fallback; weights md5-derived).",
          tags=("linalg",))
def l1_affine_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    d_in, d_out = 64, 8
    w = spark.range(d_in * d_out).select(
        (F.col("id") / d_out).cast("long").alias("i"),
        (F.col("id") % d_out).alias("j"),
    ).select(
        "i", "j",
        (
            md5_unit(
                F.concat(F.lit("w:"), F.col("i").cast("string"), F.lit(":"),
                         F.col("j").cast("string"))
            )
            - F.lit(0.5)
        ).alias("w"),
    )
    x = e.select("vec_id", F.posexplode(to_double("embedding")).alias("i", "x"))
    quantized = F.round(F.col("x") * F.col("w") * F.lit(_Q)).cast("long")
    s = (
        x.join(F.broadcast(w), "i")
        .groupBy("vec_id", "j")
        .agg((F.sum(quantized) / F.lit(float(_Q))).alias("acc"))
    )
    bias = (
        md5_unit(F.concat(F.lit("b:"), F.col("j").cast("string"))) - F.lit(0.5)
    )
    return (
        s.select("vec_id", F.col("j").alias("out_dim"), (F.col("acc") + bias).alias("y"))
        .orderBy("vec_id", "out_dim")
    )


# --- A1: Frobenius reconstruction objective ---------------------------------
# ‖norm(v2_of_next) − norm(v1)‖_F over the consecutive-vector pairing —
# the training-loss shape of CNC_AE_model_selection.py:209-229 as one
# global decimal-exact aggregate.

_A1_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding[1:32], x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
normed AS (
  SELECT vec_id,
         list_transform(v, x -> x / greatest(sqrt(list_reduce(list_transform(v, y -> y*y), (a,b) -> a+b)), 1e-12)) AS nv
  FROM e
),
diffs AS (
  SELECT a.vec_id,
         unnest(list_transform(list_zip(a.nv, b.nv), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
  FROM normed a JOIN normed b ON b.vec_id = a.vec_id + 1
)
SELECT sqrt(SUM(CAST(round(d2 * 1099511627776) AS BIGINT)) / 1099511627776.0) AS frobenius_loss
FROM diffs
"""


@register("y_a1_frobenius_recon", oracle=_A1_SQL,
          doc="Frobenius recon objective over L2-normalized views "
              "(ref CNC_AE_model_selection.py:209-229).",
          tags=("linalg", "loss"))
def a1_frobenius_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    normed = e.select(
        "vec_id", l2_normalize(slice_features(to_double("embedding"), 1, 32)).alias("nv")
    )
    a = normed
    b = normed.select((F.col("vec_id") - 1).alias("vec_id"), F.col("nv").alias("nv_b"))
    diffs = (
        a.join(b, "vec_id")
        .select(
            F.explode(
                F.zip_with("nv", "nv_b", lambda x, y: (x - y) * (x - y))
            ).alias("d2")
        )
    )
    return diffs.agg(
        F.sqrt(fpsum("d2", Q40)).alias("frobenius_loss")
    )


# --- L2: BatchNorm1d, relationally ------------------------------------------

_L2_SQL = f"""
WITH longf AS (
  SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x
  FROM embeddings
),
stats AS (
  SELECT dim,
         (SUM(CAST(round(x * {_Q}) AS BIGINT)) / {_Q}.0) / CAST(COUNT(*) AS DOUBLE) AS mu,
         (SUM(CAST(round(x * x * {_Q}) AS BIGINT)) / {_Q}.0) / CAST(COUNT(*) AS DOUBLE) AS m2
  FROM longf GROUP BY dim
)
SELECT l.id, l.dim, (l.x - s.mu) / sqrt(s.m2 - s.mu * s.mu + 1e-5) AS y
FROM longf l JOIN stats s ON l.dim = s.dim
ORDER BY l.id, l.dim
"""


@register("l2_batchnorm", oracle=_L2_SQL,
          doc="BatchNorm1d normalization as explode + per-dim stats + "
              "broadcast join (ref model_structures.py Linear->BatchNorm1d "
              "stacks); train-mode batch statistics, fixed-point portable.",
          tags=("linalg",))
def l2_batchnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.operators.scale import batchnorm1d

    e = table(spark, sf_dir, "embeddings")
    return batchnorm1d(e, "vec_id", "embedding").orderBy("id", "dim")


# --- C8: batched inference for all 8 architectures (rows-only) --------------


def _make_c8(arch: str):
    def c8(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = table(spark, sf_dir, "embeddings")
        views = e.select(
            F.col("vec_id").alias("sample_id"),
            slice_features(to_double("embedding"), 1, 32).alias("features_v1"),
            slice_features(to_double("embedding"), 33, 32).alias("features_v2"),
        )
        out = embed_and_recon(views, arch)
        return out.select(
            "sample_id",
            F.size("embedding").alias("embedding_dim"),
            "recon_loss",
        ).orderBy("sample_id")

    c8.__name__ = f"c8_infer_{arch.lower().replace('-', '_')}"
    return c8


def _check_c8_contract(sdf, spark, sf_dir: str) -> str:
    """Semantic contract for the inference queries (exact values are
    golden-tested vs local numpy in tests/test_inference.py): exactly
    one output row per input vector (no silent drops/duplicates from
    the Arrow batching), a constant positive embedding width, and
    finite non-negative reconstruction losses."""
    import math
    import os

    import duckdb

    con = duckdb.connect()
    n = con.execute(
        "SELECT COUNT(*) FROM read_parquet("
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}')"
    ).fetchone()[0]
    con.close()
    if len(sdf) != n:
        return f"{len(sdf)} rows != embeddings count {n}"
    if sdf["sample_id"].duplicated().any():
        return "duplicate sample_ids in inference output"
    dims = set(sdf["embedding_dim"])
    if len(dims) != 1 or next(iter(dims)) <= 0:
        return f"embedding_dim not a positive constant: {sorted(dims)[:5]}"
    losses = [float(v) for v in sdf["recon_loss"]]
    if not all(math.isfinite(v) and v >= 0 for v in losses):
        return "non-finite or negative recon_loss values"
    return ""


for _arch in ARCHITECTURES:
    register(
        f"z_c8_infer_{_arch.lower().replace('-', '_')}",
        oracle=None,
        doc=f"Batched {_arch} AE inference via numpy mapInPandas "
            "(ref embedding_from_retrained_models.py:7-92); golden-tested "
            "against local numpy in tests/test_inference.py; semantically "
            "contracted (exactly one row per input vector, constant "
            "positive width, finite non-negative losses).",
        tags=("linalg", "inference"),
        min_rows=100,
        columns=("sample_id", "embedding_dim", "recon_loss"),
        check=_check_c8_contract,
    )(_make_c8(_arch))


# --- L4: two-layer MLP forward chain, relationally --------------------------
# Composes L1 (affine) + L4 (activation) into a full encoder-style
# forward pass under the value-hash gate: y = relu(x W1 + b1) W2 + b2
# with md5-derived weights both engines regenerate. ReLU (greatest)
# keeps every step IEEE-exact cross-engine — tanh/sigmoid differ in
# the last ulp between Java Math and libm, so the bit-exact catalog
# uses the relu member of the reference's activation set (ref
# model_structures.py activations; L5 specs use all three, golden-
# tested in tests/test_inference.py). Same quantized-partial-sum
# discipline as l1: bigint sums commute across any partitioning.

_L4_D = (64, 8, 4)

_L4_SQL = f"""
WITH w1 AS (
  SELECT i.i, j.j,
         {_MD5U.format(key="'w1:' || i.i || ':' || j.j")} - 0.5 AS w
  FROM (SELECT unnest(range(0, {_L4_D[0]})) AS i) i,
       (SELECT unnest(range(0, {_L4_D[1]})) AS j) j
),
w2 AS (
  SELECT k.k, j.j,
         {_MD5U.format(key="'w2:' || k.k || ':' || j.j")} - 0.5 AS w
  FROM (SELECT unnest(range(0, {_L4_D[1]})) AS k) k,
       (SELECT unnest(range(0, {_L4_D[2]})) AS j) j
),
x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x
  FROM embeddings
),
h AS (
  SELECT x.vec_id, w1.j AS k,
         greatest(SUM(CAST(round(x.x * w1.w * {_Q}) AS BIGINT)) / {_Q}.0
                  + ({_MD5U.format(key="'b1:' || w1.j")} - 0.5), 0) AS h
  FROM x JOIN w1 ON x.i = w1.i
  GROUP BY x.vec_id, w1.j
)
SELECT h.vec_id, w2.j AS out_dim,
       SUM(CAST(round(h.h * w2.w * {_Q}) AS BIGINT)) / {_Q}.0
       + ({_MD5U.format(key="'b2:' || w2.j")} - 0.5) AS y
FROM h JOIN w2 ON h.k = w2.k
GROUP BY h.vec_id, w2.j
ORDER BY vec_id, out_dim
"""


def _md5_weights(spark: SparkSession, prefix: str, n_in: int, n_out: int,
                 in_col: str, out_col: str) -> DataFrame:
    return spark.range(n_in * n_out).select(
        (F.col("id") / n_out).cast("long").alias(in_col),
        (F.col("id") % n_out).alias(out_col),
    ).select(
        in_col, out_col,
        (
            md5_unit(
                F.concat(F.lit(prefix + ":"), F.col(in_col).cast("string"),
                         F.lit(":"), F.col(out_col).cast("string"))
            )
            - F.lit(0.5)
        ).alias("w"),
    )


@register("l4_relu_mlp", oracle=_L4_SQL,
          doc="Two-layer MLP forward (relu(x W1 + b1) W2 + b2) as chained "
              "explode + broadcast weight join + quantized sum-groupBy — the "
              "encoder forward chain of SURVEY L1+L4 under the value-hash "
              "gate; md5-derived weights.",
          tags=("linalg", "bench"))
def l4_relu_mlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    d_in, d_hid, d_out = _L4_D
    w1 = _md5_weights(spark, "w1", d_in, d_hid, "i", "k")
    w2 = _md5_weights(spark, "w2", d_hid, d_out, "k", "j")
    x = e.select("vec_id", F.posexplode(to_double("embedding")).alias("i", "x"))
    b1 = md5_unit(F.concat(F.lit("b1:"), F.col("k").cast("string"))) - F.lit(0.5)
    h = (
        x.join(F.broadcast(w1), "i")
        .groupBy("vec_id", "k")
        .agg((F.sum(F.round(F.col("x") * F.col("w") * F.lit(_Q)).cast("long"))
              / F.lit(float(_Q))).alias("acc"))
        .select("vec_id", "k", F.greatest(F.col("acc") + b1, F.lit(0.0)).alias("h"))
    )
    b2 = md5_unit(F.concat(F.lit("b2:"), F.col("j").cast("string"))) - F.lit(0.5)
    return (
        h.join(F.broadcast(w2), "k")
        .groupBy("vec_id", "j")
        .agg((F.sum(F.round(F.col("h") * F.col("w") * F.lit(_Q)).cast("long"))
              / F.lit(float(_Q))).alias("acc"))
        .select("vec_id", F.col("j").alias("out_dim"), (F.col("acc") + b2).alias("y"))
        .orderBy("vec_id", "out_dim")
    )


# --- L4b: the same MLP via broadcast weights + Arrow (the scale path) -------
# l4_relu_mlp's relational form expands every exploded (row, dim) cell
# by the hidden width through the weight join (rows x 64 x 8 + rows x
# 8 x 4 intermediate rows) — the same class of scale term the 100x
# leg caught in c6 (x-classes). This twin broadcasts the identical
# md5-derived weights as numpy arrays and replays the EXACT quantized
# arithmetic (per-term round(x*w*Q) -> int64 sum -> /Q -> +b -> relu)
# in an Arrow-batched kernel: zero shuffle, and the int64 per-term
# quantization makes the sums order-independent, so it passes the
# IDENTICAL DuckDB oracle as l4.

def _md5_unit_py(key: str) -> float:
    """Driver/executor twin of functions.hashing.md5_unit (empty salt):
    first 12 md5 hex digits / 16^12 — bit-identical, int/2^48 division
    is exact."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16) / float(16 ** 12)


@register("l4b_mlp_arrow", oracle=_L4_SQL,
          doc="The l4 two-layer MLP through the Arrow scale path: "
              "md5-derived weights broadcast as numpy arrays, per-term "
              "Q30-quantized accumulation replayed exactly (int64 sums "
              "are order-independent) — passes the IDENTICAL oracle as "
              "l4_relu_mlp with zero shuffle in the forward pass.",
          tags=("linalg",))
def l4b_mlp_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d_in, d_hid, d_out = _L4_D
    w1 = np.array(
        [[_md5_unit_py(f"w1:{i}:{k}") - 0.5 for k in range(d_hid)]
         for i in range(d_in)]
    )
    w2 = np.array(
        [[_md5_unit_py(f"w2:{k}:{j}") - 0.5 for j in range(d_out)]
         for k in range(d_hid)]
    )
    b1 = np.array([_md5_unit_py(f"b1:{k}") - 0.5 for k in range(d_hid)])
    b2 = np.array([_md5_unit_py(f"b2:{j}") - 0.5 for j in range(d_out)])
    bw = spark.sparkContext.broadcast((w1, w2, b1, b2))
    q = float(_Q)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w1, w2, b1, b2 = bw.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy())
            h = np.empty((len(x), d_hid))
            for k in range(d_hid):
                # (x * w) * Q — the relational expression's exact op
                # order; half-away-from-zero rounding (NOT np.rint's
                # ties-to-even) to stay on the Spark/DuckDB round() grid
                # at exact halves.
                t = np_round_half_away(x * w1[:, k] * q).sum(axis=1)
                h[:, k] = np.maximum(t / q + b1[k], 0.0)
            ids = pdf["vec_id"].to_numpy()
            out_id, out_dim, out_y = [], [], []
            for j in range(d_out):
                t = np_round_half_away(h * w2[:, j] * q).sum(axis=1)
                out_id.append(ids)
                out_dim.append(np.full(len(x), j, dtype=np.int64))
                out_y.append(t / q + b2[j])
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_id),
                    "out_dim": np.concatenate(out_dim),
                    "y": np.concatenate(out_y),
                }
            )

    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", to_double("embedding").alias("v"))
        .mapInPandas(run, "vec_id long, out_dim long, y double")
        .orderBy("vec_id", "out_dim")
    )


def mlp_forward(
    spark: SparkSession, sf_dir: str, path: str = "auto", dim: int | None = None
) -> DataFrame:
    """Production entry for the L4 MLP forward: routes between the
    relational plan (l4_relu_mlp — oracle-stable, codegen'd, best at
    fixture widths) and the broadcast-weight Arrow kernel
    (l4b_mlp_arrow — zero-shuffle forward, 6.4 s vs 40.0 s at the
    100x leg). The decision is functions.routing.route_wide — the
    SAME rule the NB scorer uses (operators/nb.py scorer="auto"),
    hoisted so the threshold lives in one place. The catalog entries
    pin their paths so the parity gate exercises both plans every
    round; callers who want the decision made for them come here.
    """
    if path not in ("auto", "relational", "arrow"):
        raise ValueError(path)
    if path == "auto":
        e = table(spark, sf_dir, "embeddings")
        path = "arrow" if route_wide(e, "embedding", dim=dim) else "relational"
    if path == "arrow":
        return l4b_mlp_arrow(spark, sf_dir)
    return l4_relu_mlp(spark, sf_dir)
