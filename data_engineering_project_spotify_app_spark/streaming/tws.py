"""Custom stateful streaming via transformWithStateInPandas (Spark 4).

The successor API to applyInPandasWithState (stateful.py): instead of
one callback threading a single state tuple, a StatefulProcessor object
holds NAMED state variables (value/list/map) with per-state TTL, and
timers are first-class (registerTimer) rather than a per-group timeout
mode. Implemented here: the same per-user running profile as
stateful.user_profiles, so the two APIs are directly comparable — and a
test asserts they produce identical profiles on the same input stream.

Scale notes unchanged from the old API: per-key state is three scalars
(bounded), batches arrive Arrow-encoded, state lives in the state store
(RocksDB-backed on a real cluster) keyed by the shuffle partitioning of
user_id. TTL on the value state (STATE_TTL_MS) is the new API's idle-key
eviction — the knob applyInPandasWithState exposed as
GroupStateTimeout.

Runtime requirements: the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) and a working
``google.protobuf`` (the TWS state server protocol) — the latter is
absent in this container, so tests/test_tws.py import-gates its
end-to-end run and the applyInPandasWithState twin carries the
always-on coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n_events bigint, total_value double, max_value double"

# Idle-key eviction horizon; None disables TTL (tests use a finite value
# only to exercise the knob — eviction timing is the store's concern).
STATE_TTL_MS: int | None = None


class ProfileProcessor(StatefulProcessor):
    """Per-user cumulative profile: count, sum, high-water mark."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState(
            "profile", _STATE_SCHEMA, ttlDurationMs=STATE_TTL_MS
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._profile.exists():
            n, total, hi = self._profile.get()
        else:
            n, total, hi = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                hi = max(hi, float(pdf["value"].max()))
        self._profile.update((n, total, hi))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [hi],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream on the transformWithState API —
    semantically identical to stateful.user_profiles."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
