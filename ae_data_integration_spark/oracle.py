"""DuckDB-oracle parity harness.

Mirrors the driver's t2 gate: run each catalog query through Spark
AND its ANSI-SQL oracle through DuckDB on the same parquet tables,
then compare row counts, column names, and values exactly (floats
bit-exact by design — see catalog/__init__ docstring; queries that
genuinely can't be bit-exact are tagged 'approx' and compared with a
1e-9 relative tolerance).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from ae_data_integration_spark.catalog import Query, load_all, oracle_for, resolve
from ae_data_integration_spark.functions.caching import release_tracked
from ae_data_integration_spark.tables import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b, rel_tol: float) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if rel_tol == 0.0:
            return fa == fb
        return math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=rel_tol)
    return a == b


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame, rel_tol: float = 0.0) -> str:
    """Return '' if equal, else a description of the first difference."""
    sdf, odf = _normalize(sdf), _normalize(odf)
    if list(sdf.columns) != list(odf.columns):
        return f"columns differ: spark={list(sdf.columns)} oracle={list(odf.columns)}"
    if len(sdf) != len(odf):
        return f"row counts differ: spark={len(sdf)} oracle={len(odf)}"
    for col in sdf.columns:
        sv, ov = sdf[col].tolist(), odf[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                if xn != yn:
                    return f"null mismatch col={col} row={i}: spark={x!r} oracle={y!r}"
                continue
            if not _values_equal(x, y, rel_tol):
                return f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}"
    return ""


def check_query(spark, con, q: Query, sf_dir: str) -> ParityResult:
    try:
        sdf = q.fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return ParityResult(q.name, False, f"spark error: {e}")
    finally:
        # queries that persist a reused intermediate (q15, q11) track
        # it; release after materializing so a full-registry parity
        # run doesn't accumulate one cached copy per query.
        release_tracked()
    if q.oracle is None:
        # No SQL oracle: enforce the declared row-count/schema contract
        # instead of accepting any non-crash.
        if len(sdf) < q.min_rows:
            return ParityResult(
                q.name, False,
                f"rows-only: {len(sdf)} rows < declared min_rows={q.min_rows}",
                len(sdf), -1,
            )
        if q.columns is not None and sorted(sdf.columns) != sorted(q.columns):
            return ParityResult(
                q.name, False,
                f"rows-only: columns {sorted(sdf.columns)} != declared {sorted(q.columns)}",
                len(sdf), -1,
            )
        if q.check is not None:
            try:
                msg = q.check(sdf, spark, sf_dir)
            except Exception as e:  # noqa: BLE001
                msg = f"check hook raised: {e}"
            if msg:
                return ParityResult(
                    q.name, False, f"semantic check failed: {msg}", len(sdf), -1
                )
        kind = (
            "rows+semantic contract" if q.check is not None else "rows-only"
        )
        return ParityResult(
            q.name, True,
            f"{kind} (no oracle; >= {q.min_rows} rows, schema pinned)"
            if q.columns else f"{kind} (no oracle; >= {q.min_rows} rows)",
            len(sdf), -1,
        )
    try:
        odf = con.execute(oracle_for(q, sf_dir)).fetchdf()
    except Exception as e:  # noqa: BLE001
        return ParityResult(q.name, False, f"oracle error: {e}", len(sdf))
    rel_tol = 1e-9 if "approx" in q.tags else 0.0
    diff = compare_frames(sdf, odf, rel_tol)
    return ParityResult(q.name, diff == "", diff or "ok", len(sdf), len(odf))


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    registry = load_all()
    if names:
        # rotation-stable addressing: unprefixed historical names
        # resolve to their current y_/z_ registry key
        names = [resolve(n) for n in names]
        unknown = sorted(set(names) - set(registry))
        if unknown:
            raise KeyError(f"unknown queries: {unknown}; known: {sorted(registry)}")
    con = duck_connection(sf_dir)
    results = []
    for name, q in sorted(registry.items()):
        if names and name not in names:
            continue
        results.append(check_query(spark, con, q, sf_dir))
    con.close()
    return results
