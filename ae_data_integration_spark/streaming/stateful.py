"""Custom stateful streaming operators (brief: applyInPandasWithState).

`running_user_counts` keeps one long per user across micro-batches —
the minimal custom-state operator proving the plumbing (state schema,
Arrow group iteration, update semantics). The same skeleton carries
the heavier operators (streaming sessionization with gap timeouts,
streaming dedup with seen-key state); state is per-key and bounded by
key cardinality × state width.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("count", LongType())])


def _count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    old = state.get[0] if state.exists else 0
    n = old + sum(len(p) for p in pdfs)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user cumulative event count, maintained as custom state
    across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
