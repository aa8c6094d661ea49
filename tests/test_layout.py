"""Data-layout writers: partition pruning + Z-order skip-ability.

These assert the SCAN-side effects that matter at 100 TB: a partition
predicate prunes directories before any file opens, and Z-order
clustering keeps every clustered dimension narrow per file (so
parquet min/max stats can skip most files for predicates on ANY of
the clustered columns — a plain sort only achieves that for its
leading key).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ae_data_integration_spark.plans.explain import formatted_plan
from ae_data_integration_spark.sources.layout import (
    write_clustered,
    write_partitioned,
    zorder_key,
)
from ae_data_integration_spark.tables import table
from tests.conftest import SF_SMOKE


def _per_file_spans(spark, path: str, cols: list[str]) -> dict[str, float]:
    """Mean per-file (max-min) span of each column, normalized by the
    global span — the fraction of the key range a typical file
    covers. Small = skippable."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    glob_stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    per_file = (
        df.groupBy("f")
        .agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
        )
        .collect()
    )
    out = {}
    for c in cols:
        g = glob_stats[f"hi_{c}"] - glob_stats[f"lo_{c}"] or 1.0
        spans = [(r[f"hi_{c}"] - r[f"lo_{c}"]) / g for r in per_file]
        out[c] = sum(spans) / len(spans)
    return out


def test_partitioned_write_prunes_directories(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events")
    path = os.path.join(str(tmp_path), "by_type")
    write_partitioned(ev, path, ["event_type"], sort_cols=["ts"])
    # one directory per type on disk
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(path, "event_type=*"))}
    assert len(dirs) == ev.select("event_type").distinct().count()

    q = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "event_type" in plan
    # the non-partition data files carry no event_type column at all —
    # the predicate never touches row data
    assert q.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_zorder_files_narrow_in_every_dimension(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    zpath = os.path.join(str(tmp_path), "zordered")
    spath = os.path.join(str(tmp_path), "sorted")
    write_clustered(ev, zpath, ["user_id", "ts_us"], n_files=16)
    # baseline: plain sort on the SAME file count
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    z = _per_file_spans(spark, zpath, ["user_id", "ts_us"])
    s = _per_file_spans(spark, spath, ["user_id", "ts_us"])
    # plain sort: narrow in user_id, ~full-range in ts_us — a ts
    # predicate cannot skip anything
    assert s["user_id"] < 0.35
    assert s["ts_us"] > 0.8
    # z-order: the WORST clustered dimension stays materially narrow,
    # so min/max stats can skip files for predicates on either column
    assert max(z.values()) < 0.6
    assert z["ts_us"] < s["ts_us"] / 2
    # and no rows lost
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_key_is_deterministic_and_bounded(spark):
    ev = table(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    k1 = ev.select(zorder_key(ev, ["user_id", "ts_us"])).agg(
        F.min("zkey"), F.max("zkey")
    ).first()
    k2 = ev.repartition(7).select(zorder_key(ev, ["user_id", "ts_us"])).agg(
        F.min("zkey"), F.max("zkey")
    ).first()
    assert (k1[0], k1[1]) == (k2[0], k2[1])
    assert 0 <= k1[0] and k1[1] < (1 << 32)
