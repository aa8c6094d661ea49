"""Physical-plan inspection: make scale properties testable.

"Would this plan survive a 100× scale-up?" is a property of the
physical plan, not the output — so the engine asserts it in CI:
filters reach the parquet scan (PushedFilters), column pruning
narrows ReadSchema, dimension joins broadcast instead of shuffling,
and hot paths stay inside WholeStageCodegen rather than falling out
to row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


class plan_asserts:
    """Assertion helpers over the formatted physical plan."""

    def __init__(self, df: DataFrame):
        self.plan = formatted_plan(df)

    def has_pushed_filter(self, fragment: str) -> "plan_asserts":
        ok = False
        for line in self.plan.splitlines():
            if "PushedFilters" in line and fragment in line:
                ok = True
        assert ok, f"no pushed filter containing {fragment!r}:\n{self.plan}"
        return self

    def reads_only(self, table_fragment: str, columns: set[str]) -> "plan_asserts":
        """ReadSchema for the scan of `table_fragment` is ⊆ columns."""
        import re

        for block in self.plan.split("\n\n"):
            if table_fragment not in block:
                continue
            m = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if m:
                read = {c.split(":")[0].strip() for c in m.group(1).split(",") if c}
                assert read <= columns, (
                    f"scan of {table_fragment} reads {read - columns} beyond {columns}"
                )
                return self
        raise AssertionError(f"no ReadSchema found for {table_fragment}:\n{self.plan}")

    def has_broadcast_join(self, n: int = 1) -> "plan_asserts":
        got = self.plan.count("BroadcastHashJoin")
        assert got >= n, f"expected ≥{n} BroadcastHashJoin, got {got}:\n{self.plan}"
        return self

    def has_broadcast_exchange(self, n: int = 1) -> "plan_asserts":
        """Any broadcast distribution (hash join OR nested-loop cross
        with a broadcast side — the right shape for probe-set × corpus)."""
        got = self.plan.count("BroadcastExchange")
        assert got >= n, f"expected ≥{n} BroadcastExchange, got {got}:\n{self.plan}"
        return self

    def no_sort_merge_join(self) -> "plan_asserts":
        assert "SortMergeJoin" not in self.plan, f"unexpected SortMergeJoin:\n{self.plan}"
        return self

    def no_python_row_udf(self) -> "plan_asserts":
        assert "BatchEvalPython" not in self.plan, (
            f"row-at-a-time Python UDF in plan:\n{self.plan}"
        )
        return self

    def has_partial_agg(self) -> "plan_asserts":
        """Map-side combine present: the shuffle carries partial
        aggregates, not raw rows (formatted AQE plans hide
        WholeStageCodegen markers, so this is the testable proxy for
        'the aggregation pipeline stays in the fast path')."""
        assert "partial_" in self.plan, f"no partial aggregation:\n{self.plan}"
        return self
