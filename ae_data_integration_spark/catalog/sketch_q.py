"""Sketch queries: Count-Min frequency estimation under the full
value-hash gate.

The CMS is md5-hashed (functions/hashing.md5_bucket), so DuckDB
rebuilds the identical d x w integer cell grid and the identical
min-over-cells estimates — a sketch whose every cell is
cross-engine-verified. HLL/quantile sketches are engine-internal
state and live in pytest (tests/test_sketch.py) with tolerance
checks against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ae_data_integration_spark.catalog import register
from ae_data_integration_spark.functions.sketch import cms_build, cms_estimate
from ae_data_integration_spark.tables import table

_D, _W = 4, 64

_B = (
    "CAST(('0x' || substr(md5('cms' || r.r || ':' || CAST({key} AS VARCHAR)), 1, 12)) "
    "AS BIGINT) % {w}"
)

_SK1_SQL = f"""
WITH ev AS (SELECT user_id FROM events),
rs AS (SELECT unnest(range(0, {_D})) AS r),
cells AS (
  SELECT r.r AS r, {_B.format(key="ev.user_id", w=_W)} AS b, COUNT(*) AS cnt
  FROM ev, rs r GROUP BY 1, 2
),
ex AS (
  SELECT user_id, COUNT(*) AS exact_n FROM ev GROUP BY user_id
  ORDER BY exact_n DESC, user_id LIMIT 10
),
est AS (
  SELECT e.user_id, e.exact_n, MIN(COALESCE(c.cnt, 0)) AS cms_n
  FROM ex e CROSS JOIN rs r
  LEFT JOIN cells c ON c.r = r.r AND c.b = {_B.format(key="e.user_id", w=_W)}
  GROUP BY e.user_id, e.exact_n
)
SELECT user_id, exact_n, cms_n FROM est ORDER BY exact_n DESC, user_id
"""


@register("sk1_cms_heavy_hitters", oracle=_SK1_SQL,
          doc="Count-Min sketch frequency estimates for the top-10 users by "
              "event count, next to exact counts — the d x w md5-hashed cell "
              "grid and the min-over-cells estimates are integer arithmetic "
              "both engines reproduce bit-exactly. Sketch build = one "
              "map-side-combined agg to d*w cells; estimate = broadcast "
              "join of the cell table.",
          tags=("sketch", "bench"))
def sk1_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id", d=_D, w=_W)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    return cms_estimate(sketch, top, "user_id", d=_D, w=_W).orderBy(
        F.desc("exact_n"), "user_id"
    )


# --- SK2: K-minimum-values distinct estimation ------------------------------

_K2 = 32

_SK2_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
),
h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)
           / 281474976710656.0 AS h
  FROM d
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM h
),
agg AS (
  SELECT event_type, COUNT(*) AS n_exact,
         MAX(CASE WHEN rk = {_K2} THEN h END) AS hk
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_exact,
       CASE WHEN hk IS NOT NULL THEN {float(_K2 - 1)!r} / hk
            ELSE CAST(n_exact AS DOUBLE) END AS kmv_est
FROM agg
ORDER BY event_type
"""


@register("sk2_kmv_distinct", oracle=_SK2_SQL,
          doc="K-minimum-values distinct-user estimate per event type "
              "(k=32) next to the exact count — an md5-deterministic "
              "distinct sketch whose estimate both engines reproduce "
              "bit-exactly (HLL++ gives the same bound but engine-internal "
              "state; KMV puts the sketch itself under the value-hash "
              "gate). One distinct + one per-group hash window.",
          tags=("sketch",))
def sk2_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.sketch import kmv_distinct

    ev = table(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", "event_type", k=_K2).orderBy("event_type")


# --- SK3: Bloom-filter join pre-filter --------------------------------------
# The shuffle-avoidance pattern for big joins: build a Bloom filter
# over the build side's join keys (orders.o_custkey), broadcast it,
# and pre-filter the probe side (customer) BEFORE the shuffle join —
# at 100 TB the filter drops most probe rows at the scan, so the join
# shuffles a fraction of the data (Spark's runtime bloom-join does
# this internally; the explicit md5 construction puts the whole
# sketch — bit positions, membership rule, false-positive behaviour —
# under the cross-engine value-hash gate). m = 4096 bits, 3 hashes;
# the filter is carried as the DISTINCT set of set-bit positions
# (<= m rows, broadcast), and a probe key is a candidate iff ALL its
# (distinct) positions are set. Output compares candidates against
# the exact semi-join per key-mod-10 group, exposing the measured
# false-positive count next to the sketch parameters' prediction.

_M3, _KH3 = 4096, 3

_P3B = (
    "CAST(('0x' || substr(md5('bf' || i.i || ':' || CAST({key} AS VARCHAR)), 1, 12)) "
    f"AS BIGINT) % {_M3}"
)

_SK3_PRED = "o_orderpriority = '1-URGENT' AND o_totalprice > 250000"

_SK3_SQL = f"""
WITH ok AS (SELECT DISTINCT o_custkey AS key FROM orders WHERE {_SK3_PRED}),
hs AS (SELECT unnest(range(0, {_KH3})) AS i),
bloom AS (
  SELECT DISTINCT {_P3B.format(key="ok.key")} AS pos FROM ok, hs i
),
cust AS (SELECT c_custkey AS key FROM customer),
ps AS (
  SELECT DISTINCT cust.key, {_P3B.format(key="cust.key")} AS pos FROM cust, hs i
),
np AS (SELECT key, COUNT(*) AS np FROM ps GROUP BY key),
nm AS (
  SELECT ps.key, COUNT(*) AS nm FROM ps JOIN bloom ON ps.pos = bloom.pos GROUP BY ps.key
),
cand AS (SELECT np.key FROM np JOIN nm ON np.key = nm.key AND np.np = nm.nm),
flags AS (
  SELECT c.key,
         CASE WHEN cd.key IS NOT NULL THEN 1 ELSE 0 END AS is_cand,
         CASE WHEN ok.key IS NOT NULL THEN 1 ELSE 0 END AS is_member
  FROM cust c
  LEFT JOIN cand cd ON c.key = cd.key
  LEFT JOIN ok ON c.key = ok.key
)
SELECT key % 10 AS grp,
       COUNT(*) AS n_probed,
       CAST(SUM(is_member) AS BIGINT) AS n_exact,
       CAST(SUM(is_cand) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN is_cand = 1 AND is_member = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM flags
GROUP BY grp
ORDER BY grp
"""


def _bf_pos(i: int, key):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 12
            ), 16, 10,
        ).cast("long")
        % F.lit(_M3)
    )


@register("sk3_bloom_prefilter", oracle=_SK3_SQL,
          doc="Bloom-filter join pre-filter (m=4096, k=3, md5 positions): "
              "build over urgent high-value orders' custkeys, broadcast "
              "the set-bit list, "
              "probe customers (member iff all positions set); per-group "
              "exact-vs-candidate-vs-false-positive counts.",
          tags=("sketch", "bench"))
def sk3_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ok = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 250000)
        )
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bloom = (
        ok.select(
            F.explode(F.array(*[_bf_pos(i, F.col("key")) for i in range(_KH3)])).alias("pos")
        )
        .distinct()
    )
    cust = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    ps = cust.select(
        "key",
        F.array_distinct(
            F.array(*[_bf_pos(i, F.col("key")) for i in range(_KH3)])
        ).alias("pss"),
    ).select("key", F.size("pss").alias("np"), F.explode("pss").alias("pos"))
    cand = (
        ps.join(F.broadcast(bloom), "pos")
        .groupBy("key", "np")
        .agg(F.count(F.lit(1)).alias("nm"))
        .filter(F.col("nm") == F.col("np"))
        .select("key")
        .withColumn("is_cand", F.lit(1))
    )
    member = ok.withColumn("is_member", F.lit(1))
    flags = (
        cust.join(cand, "key", "left")
        .join(member, "key", "left")
        .select(
            "key",
            F.coalesce("is_cand", F.lit(0)).alias("is_cand"),
            F.coalesce("is_member", F.lit(0)).alias("is_member"),
        )
    )
    return (
        flags.groupBy((F.col("key") % 10).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum("is_member").alias("n_exact"),
            F.sum("is_cand").alias("n_candidates"),
            F.sum(
                F.when((F.col("is_cand") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
            ).alias("n_false_pos"),
        )
        .orderBy("grp")
    )


# --- SK4: GK quantile sketch vs exact ranks ----------------------------------
# The one mergeable sketch family (Greenwald-Khanna, Spark's
# approxQuantile) that had pytest coverage but no driver-visible
# query. The sketch state is engine-internal (merge order is not
# fixed-point), so there is no SQL value oracle; instead the
# contract check computes the EXACT rank of every returned value in
# DuckDB and enforces the GK guarantee |rank - p*N| <= eps*N. One
# pass, mergeable per-partition state, no shuffle of the column.

_SK4_PROBS = (0.25, 0.5, 0.75, 0.95)
_SK4_EPS = 0.01


def _check_sk4_rank_error(sdf, spark, sf_dir: str) -> str:
    import os

    import duckdb

    con = duckdb.connect()
    pq = os.path.join(sf_dir, "lineitem.parquet")
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{pq}')"
    ).fetchone()[0]
    rows = sorted(
        (float(t.probability), float(t.value)) for t in sdf.itertuples()
    )
    if [p for p, _ in rows] != sorted(_SK4_PROBS):
        con.close()
        return f"probabilities wrong: {[p for p, _ in rows]}"
    for p, v in rows:
        rank = con.execute(
            "SELECT COUNT(*) FROM read_parquet(?) "
            "WHERE l_extendedprice <= ?", [pq, v]
        ).fetchone()[0]
        if abs(rank - p * n) > _SK4_EPS * n + 1:
            con.close()
            return (
                f"p={p}: value {v} has exact rank {rank}, "
                f"target {p * n:.0f} ± {_SK4_EPS * n:.0f}"
            )
    con.close()
    return ""


@register("sk4_gk_quantiles", oracle=None,
          doc="Greenwald-Khanna quantile sketch (approxQuantile) over "
              "lineitem prices at eps=0.01 — single pass, mergeable "
              "per-partition state. Contract check verifies the GK rank "
              "guarantee against exact DuckDB ranks: |rank(v) - p*N| <= "
              "eps*N for every returned quantile.",
          tags=("sketch",), min_rows=4,
          columns=("probability", "value"),
          check=_check_sk4_rank_error)
def sk4_gk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.sketch import approx_quantiles

    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    vals = approx_quantiles(
        li, "l_extendedprice", list(_SK4_PROBS), relative_error=_SK4_EPS
    )
    return spark.createDataFrame(
        [(p, v) for p, v in zip(_SK4_PROBS, vals)],
        "probability double, value double",
    ).orderBy("probability")


# --- SK5: KMV-estimated cross-source vocabulary overlap matrix ---------------
# The sketch-cost twin of d7's near-dup source matrix: how much does
# each source's VOCABULARY overlap each other's? Exact pairwise
# Jaccard needs the token-key self-join (Σ_token C(sources, 2) rows —
# quadratic in overlapping sources at 100 TB); the KMV route needs
# only each source's k-minima sketch (|sources| x k rows, mergeable),
# and the pair stage merges 2k-row lists. Both the ESTIMATE and the
# exact value are emitted and value-hash oracled, so the estimator's
# error is itself under the correctness gate; the pytest contract
# additionally bounds max |est - exact| by the ~1/sqrt(k) theory.

_SK5_K = 64
_SK5_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"

_SK5_SQL = f"""
WITH d AS (
  SELECT DISTINCT source AS g, tok
  FROM (SELECT source, unnest({_SK5_TOKS}) AS tok FROM documents)
),
h AS (
  SELECT g,
         CAST(('0x' || substr(md5('kmvj:' || tok), 1, 12)) AS BIGINT)
           / 281474976710656.0 AS h
  FROM d
),
minima AS (
  SELECT g, h FROM (
    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rk FROM h
  ) WHERE rk <= {_SK5_K}
),
gs AS (SELECT DISTINCT g FROM d),
tagged AS (
  SELECT m.g AS src_a, o.g AS src_b, m.h, 1 AS in_a, 0 AS in_b
  FROM minima m, gs o WHERE m.g < o.g
  UNION ALL
  SELECT o.g AS src_a, m.g AS src_b, m.h, 0 AS in_a, 1 AS in_b
  FROM minima m, gs o WHERE o.g < m.g
),
merged AS (
  SELECT src_a, src_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM tagged GROUP BY src_a, src_b, h
),
est AS (
  SELECT src_a, src_b,
         SUM(in_a * in_b) / CAST(LEAST(COUNT(*), {_SK5_K}) AS DOUBLE) AS kmv_jaccard
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
    FROM merged
  ) WHERE rk <= {_SK5_K}
  GROUP BY src_a, src_b
),
sizes AS (SELECT g, COUNT(*) AS n FROM d GROUP BY g),
inter AS (
  SELECT a.g AS src_a, b.g AS src_b, COUNT(*) AS n_inter
  FROM d a JOIN d b ON a.tok = b.tok AND a.g < b.g
  GROUP BY a.g, b.g
)
SELECT e.src_a, e.src_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS DOUBLE) AS exact_jaccard,
       e.kmv_jaccard
FROM est e
JOIN sizes sa ON sa.g = e.src_a
JOIN sizes sb ON sb.g = e.src_b
LEFT JOIN inter i ON i.src_a = e.src_a AND i.src_b = e.src_b
ORDER BY e.src_a, e.src_b
"""


@register("sk5_kmv_jaccard_matrix", oracle=_SK5_SQL,
          doc="Cross-source vocabulary-overlap matrix from merged KMV "
              "sketches (k=64) next to the exact pairwise Jaccard: the "
              "sketch costs |sources|*k mergeable rows where exact needs "
              "the token-key self-join; both columns value-hash oracled so "
              "the estimator's error sits under the correctness gate.",
          tags=("sketch", "dedup"))
def sk5_kmv_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ae_data_integration_spark.functions.sketch import kmv_jaccard_matrix
    from ae_data_integration_spark.functions.text import tokens

    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("tok"))
    return kmv_jaccard_matrix(
        tok, key="tok", group="source", k=_SK5_K, salt="kmvj"
    ).orderBy("src_a", "src_b")
