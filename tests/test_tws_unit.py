"""transformWithState processor logic, executed WITHOUT the protobuf
runtime: ProfileProcessor is a plain Python class over a handle
interface, so a fake handle/value-state drives the exact code the TWS
runtime would call — per-batch accumulation, multi-chunk groups, and
equivalence with the applyInPandasWithState twin on identical input.
(tests/test_tws.py keeps the gated END-TO-END run for environments that
have google.protobuf; this file is the always-on coverage of the
processor itself.)"""

from __future__ import annotations

import pandas as pd

from data_engineering_project_spotify_app_spark.streaming.stateful import (
    _update_profile,
)
from data_engineering_project_spotify_app_spark.streaming.tws import (
    ProfileProcessor,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.states[name] = FakeValueState()
        return self.states[name]


class FakeGroupState:
    """Minimal applyInPandasWithState GroupState for the twin."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _batch(values):
    return pd.DataFrame({"value": values})


def test_profile_processor_accumulates_across_batches():
    p = ProfileProcessor()
    p.init(FakeHandle())
    out1 = list(p.handleInputRows((7,), [_batch([10.0, 20.0])], None))
    out2 = list(p.handleInputRows((7,), [_batch([30.0])], None))
    r1, r2 = out1[0].iloc[0], out2[0].iloc[0]
    assert (r1["n_events"], r1["total_value"], r1["max_value"]) == (2, 30.0, 20.0)
    assert (r2["n_events"], r2["total_value"], r2["max_value"]) == (3, 60.0, 30.0)
    p.close()


def test_profile_processor_handles_multi_chunk_groups():
    # a big group arrives as several Arrow chunks in one call
    p = ProfileProcessor()
    p.init(FakeHandle())
    chunks = [_batch([1.0, 2.0]), _batch([]), _batch([5.0])]
    (row,) = list(p.handleInputRows((1,), chunks, None))[0].iloc
    assert (row["n_events"], row["total_value"], row["max_value"]) == (3, 8.0, 5.0)


def test_tws_and_applyinpandas_twins_agree_on_identical_stream():
    # same per-user micro-batch slicing through both stateful APIs
    batches = {
        7: [[10.0, 20.0], [30.0], [0.5]],
        8: [[5.0], [], [2.5]],
    }
    # the TWS runtime scopes each state variable per grouping key; the
    # fake handle holds ONE state, so mirror that with one processor
    # instance per user
    procs = {}
    for u in batches:
        procs[u] = ProfileProcessor()
        procs[u].init(FakeHandle())
    twin_state = {u: FakeGroupState() for u in batches}
    for u, seq in batches.items():
        last_tws = last_twin = None
        for vals in seq:
            out = list(procs[u].handleInputRows((u,), [_batch(vals)], None))
            last_tws = out[0].iloc[0]
            tw = list(_update_profile((u,), [_batch(vals)], twin_state[u]))
            last_twin = tw[0].iloc[0]
        for col in ("n_events", "total_value", "max_value"):
            assert last_tws[col] == last_twin[col], (u, col)
