"""Tracked persist: cache-scoped reuse without shared-JVM leaks.

Some catalog queries persist a model-sized intermediate that the plan
reuses twice (q15's per-supplier revenue CTE, q11's per-part value) —
the persist is load-bearing (the fact scan + shuffle run once, like
the SQL CTE) and must stay visible in the physical plan (the plan
gate asserts the InMemoryTableScan reuse and the scan-level pushdown
upstream of it). But a bare .persist() from a catalog function is
never unpersisted by any caller, so every bench rep / parity rerun in
a shared JVM left another cached copy resident, accumulating
storage-memory pressure and adding noise to the timings.

This module is the fix: catalog functions persist through
``persist_tracked`` and the harnesses (bench.py between reps,
scripts/check_parity.py and tests/test_parity.py between queries)
call ``release_tracked()`` once the result is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for a later harness-driven unpersist."""
    df = df.persist()
    _LIVE.append(df)
    return df


def persist_tracked_if_small(
    df: DataFrame, max_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """persist_tracked when Catalyst's sizeInBytes estimate is under
    ``max_bytes``; pass through UNCACHED otherwise. For frames whose
    size follows the corpus (shingle tables): a cache that saves one
    recompute at bench scale pins the storage pool and starves
    execution at the third decade (d2b's 1000x cache build OOM'd in
    CachedRDDBuilder; pipe5b's equivalent starved
    UNABLE_TO_ACQUIRE_MEMORY — SCALE_SPOT_r10). The estimate is
    driver-side plan stats, no job; when stats are unavailable the
    frame streams uncached — the scale-safe default."""
    try:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ))
    except Exception:  # noqa: BLE001 - stats are an optimization only
        return df
    return persist_tracked(df) if est <= max_bytes else df


def coalesce_for_size(
    df: DataFrame, target_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Coalesce to ~``target_bytes`` partitions (capped at the default
    parallelism, floored at 1) using Catalyst's sizeInBytes estimate —
    driver-side plan stats, no job. For frames that are about to be
    materialized (persist/localCheckpoint) and then RE-SCANNED many
    times by a driver loop (the BPE vocab: 10-20+ rounds): a cached
    shuffle output keeps its pre-AQE partition count
    (canChangeCachedPlanOutputPartitioning is off by default), so a
    model-sized table cached at shuffle.partitions granularity pays
    tasks-per-round × rounds of pure scheduling overhead. The size
    estimate keeps this scale-adaptive: a 100-TB-derived vocab keeps
    its parallelism (guide §2.2 — size partitions to ~100 MB-1 GB,
    not to the fixture). Unknown stats pass through unchanged."""
    try:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ))
    except Exception:  # noqa: BLE001 - stats are an optimization only
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    n = max(1, min(par, (est + target_bytes - 1) // target_bytes))
    return df.coalesce(int(n))


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for release_tracked() —
    for loop-style operators (dbscan label propagation) whose final
    generation is persisted inside the loop and escapes via return."""
    _LIVE.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked intermediate (non-blocking); returns
    how many were released. Safe to call at any point — queries whose
    results were already materialized keep their values; an
    un-materialized plan just recomputes."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist()
        n += 1
    return n
