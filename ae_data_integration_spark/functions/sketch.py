"""Mergeable sketches for 100 TB-scale approximate analytics.

At cluster scale, exact per-key statistics over high-cardinality
columns cost a full key shuffle; sketches reduce that to a
constant-size state that merges associatively (map-side combine does
most of the work, the shuffle carries kilobytes):

- **Count-Min** (`cms_build`/`cms_estimate`): d x w integer cell
  grid; point-frequency estimates with one-sided error (never
  under-counts, over-counts by <= 2N/w with prob 1-2^-d). Hashes are
  md5-derived (functions/hashing.md5_bucket), so the whole sketch is
  deterministic, partition-independent, and bit-reproducible by the
  DuckDB oracle — the catalog's sk1 query verifies cells AND
  estimates value-exactly.
- **HyperLogLog** (`hll_distinct`): Spark's built-in
  approx_count_distinct (HLL++, JVM-side, mergeable); rsd-bounded.
- **Quantile sketch** (`approx_quantiles`): Spark's built-in
  Greenwald-Khanna percentile_approx with an explicit accuracy knob.

The built-ins are engine-internal state (not SQL-replayable), so
their guarantees are pytest-tested against exact computations; the
Count-Min path carries the full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ae_data_integration_spark.functions.hashing import md5_bucket
from ae_data_integration_spark.functions.caching import persist_tracked


def cms_build(
    df: DataFrame, key: str, d: int = 4, w: int = 64, salt: str = "cms"
) -> DataFrame:
    """Count-Min sketch of the frequency of ``key``: a (r, b, cnt)
    cell table with d rows x w buckets. One narrow projection explodes
    each input row to its d cells; the groupBy partial-aggregates
    map-side, so the shuffle moves at most d*w*partitions cells —
    constant in data volume."""
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    md5_bucket(key, w, salt=f"{salt}{r}:").alias("b"),
                )
                for r in range(d)
            ]
        )
    ).alias("cell")
    return (
        df.select(cell)
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = 4,
    w: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for ``probes[key]``: min over the d
    cells each probe hashes to. The sketch is d*w rows — broadcast it;
    probes never shuffle.

    Cells the sketch never populated count as 0 (left join +
    coalesce), so a probe key outside the build set gets the correct
    CMS point-query answer of 0 instead of being dropped."""
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    md5_bucket(key, w, salt=f"{salt}{r}:").alias("b"),
                )
                for r in range(d)
            ]
        )
    ).alias("cell")
    probe_cells = probes.select(*probes.columns, cell).select(
        *probes.columns, F.col("cell.r").alias("r"), F.col("cell.b").alias("b")
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("cms_n"))
    )


def hll_distinct(df: DataFrame, key: str, rsd: float = 0.02) -> Column:
    """HyperLogLog++ distinct count with relative standard deviation
    ``rsd`` — mergeable constant-size state per group."""
    return F.approx_count_distinct(key, rsd)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], relative_error: float = 0.01
) -> list[float]:
    """Greenwald-Khanna quantile sketch (single pass, mergeable);
    rank error <= relative_error * N."""
    return df.approxQuantile(col, probabilities, relative_error)


def kmv_distinct(
    df: DataFrame,
    key: str,
    group: str,
    k: int = 32,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count estimate per group:
    md5-normalize each distinct key into [0,1); with h_(k) the k-th
    smallest hash, estimate = (k-1)/h_(k) (exact count when a group
    has < k distinct keys — the standard KMV fallback).

    Unlike HLL++ the whole sketch state is md5-derived, so the
    estimate is deterministic, partition-independent, and
    bit-reproducible by any engine (the catalog's sk2 query verifies
    it value-exactly). Mergeable: union the k-minima sets and re-take
    the k smallest. Shuffle: one distinct + one k-row-per-group
    window over hashes."""
    from pyspark.sql import Window

    from ae_data_integration_spark.functions.hashing import md5_unit

    d = df.select(group, key).distinct().select(
        group, md5_unit(key, salt=f"{salt}:").alias("h")
    )
    w = Window.partitionBy(group).orderBy("h")
    ranked = d.select(group, "h", F.row_number().over(w).alias("rk"))
    agg = ranked.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("hk"),
    )
    return agg.select(
        group,
        "n_exact",
        F.when(
            F.col("hk").isNotNull(), F.lit(float(k - 1)) / F.col("hk")
        ).otherwise(F.col("n_exact").cast("double")).alias("kmv_est"),
    )


def kmv_jaccard_matrix(
    df: DataFrame,
    key: str,
    group: str,
    k: int = 64,
    salt: str = "kmvj",
) -> DataFrame:
    """Pairwise Jaccard similarity between every two groups' KEY SETS,
    estimated from merged K-minimum-values sketches next to the exact
    value (the error exhibit).

    Estimator (Beyer et al. 2007 / the DataSketches theta-sketch
    rule): among the k smallest hashes of A ∪ B — obtainable from the
    two k-minima lists alone, since topk(A ∪ B) ⊆ topk(A) ∪ topk(B)
    — count those present in BOTH groups; J_est = that count / k.
    Standard error ~ 1/sqrt(k).

    Scale shape: the sketches are ONE distinct + one per-group top-k
    window (|groups| * k rows total — model-sized); the pair stage
    merges 2k-row lists per pair, so the sketch-side cost is
    |groups|^2 * k however large the corpus. The exact columns
    require the token-key self-join (Σ_token C(groups_with_token, 2)
    rows) — the quadratic term the sketch REPLACES at 100 TB; they
    are computed here so the estimate's error is itself under test.

    Everything is md5-deterministic, so both the estimates and the
    exact values are value-hash oracled.
    """
    from pyspark.sql import Window

    from ae_data_integration_spark.functions.hashing import md5_unit

    d = df.select(group, key).distinct().transform(persist_tracked)
    h = d.select(F.col(group).alias("g"), md5_unit(key, salt=f"{salt}:").alias("h"))
    w = Window.partitionBy("g").orderBy("h")
    minima = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("g", "h")
    )

    # merged-minima pair stage: |groups|^2 * k rows, all tiny
    ma = minima.select(F.col("g").alias("src_a"), "h")
    mb = minima.select(F.col("g").alias("src_b"), "h")
    merged = (
        ma.join(mb.select("src_b").distinct(), F.lit(True))
        .filter(F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            mb.join(ma.select("src_a").distinct(), F.lit(True))
            .filter(F.col("src_a") < F.col("src_b"))
            .select("src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    est = (
        merged.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= k)
        .groupBy("src_a", "src_b")
        .agg(
            (F.sum(F.col("in_a") * F.col("in_b")) / F.least(
                F.count(F.lit(1)), F.lit(k)
            ).cast("double")).alias("kmv_jaccard")
        )
    )

    # exact: token-key self-join (the cost the sketch replaces)
    da = d.select(F.col(group).alias("src_a"), F.col(key).alias("_k"))
    db = d.select(F.col(group).alias("src_b"), F.col(key).alias("_k"))
    inter = (
        da.join(db, "_k")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = d.groupBy(group).agg(F.count(F.lit(1)).alias("n"))
    exact = (
        est.select("src_a", "src_b")
        .join(sizes.select(F.col(group).alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(sizes.select(F.col(group).alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a", "src_b", "n_a", "n_b",
            F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
        )
    )
    return est.join(exact, ["src_a", "src_b"]).select(
        "src_a", "src_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("exact_jaccard"),
        "kmv_jaccard",
    )
