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


# ---- timer surface: SessionProcessor vs the applyInPandasWithState twin


class FakeTimers:
    """Handle timer registry for ONE key (the TWS runtime scopes timers
    per grouping key, like state)."""

    def __init__(self):
        self.timers: set[int] = set()

    def registerTimer(self, expiryTimestampMs: int) -> None:
        self.timers.add(int(expiryTimestampMs))

    def deleteTimer(self, expiryTimestampMs: int) -> None:
        self.timers.discard(int(expiryTimestampMs))

    def listTimers(self):
        return iter(sorted(self.timers))


class FakeTimerHandle(FakeHandle, FakeTimers):
    def __init__(self):
        FakeHandle.__init__(self)
        FakeTimers.__init__(self)


class FakeExpiredTimerInfo:
    def __init__(self, ms: int):
        self._ms = ms

    def getExpiryTimeInMs(self) -> int:
        return self._ms


class FakeSessionGroupState(FakeGroupState):
    """Adds the event-time-timeout half of GroupState the session twin
    uses: hasTimedOut / remove / setTimeoutTimestamp."""

    def __init__(self):
        super().__init__()
        self.hasTimedOut = False
        self.timeout_ms = None

    def remove(self):
        self.exists = False
        self._v = None
        self.timeout_ms = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = int(ms)


# FakeValueState needs clear() for the session close path
FakeValueState.clear = lambda self: setattr(self, "_v", None)


def _ts_batch(epoch_ms_list):
    return pd.DataFrame(
        {"ts": pd.to_datetime(pd.Series(epoch_ms_list, dtype="int64"), unit="ms")}
    )


def test_session_processor_timer_twin_agreement():
    """Scripted stream with a progressing watermark, run through BOTH
    stateful APIs: sessions must close identically (same bounds, same
    counts), including the session that a late-extension re-arms — the
    case where TWS's ACCUMULATING timers diverge from the twin's
    overwriting setTimeoutTimestamp unless the stale alarm is deleted
    (the exact bug the processor's delete-first re-arm prevents)."""
    from data_engineering_project_spotify_app_spark.streaming.stateful import (
        _session_fn,
    )
    from data_engineering_project_spotify_app_spark.streaming.tws import (
        SessionProcessor,
    )

    GAP = 1_000  # ms
    # (watermark_ms_after_batch, {user: [event ts ms, ...]})
    script = [
        (0, {1: [1_000, 1_400], 2: [1_100]}),
        (1_500, {1: [2_000]}),          # user 1 extends (re-arms alarm)
        (3_500, {}),                    # wm passes both ends + gap
        (3_600, {1: [5_000], 2: [5_100]}),  # new sessions after close
        (7_000, {}),                    # closes the second pair
    ]

    procs, handles = {}, {}
    twin_state = {}
    tws_closed, twin_closed = [], []

    for wm, batches in script:
        for u, evs in batches.items():
            if u not in procs:
                procs[u] = SessionProcessor(GAP)
                handles[u] = FakeTimerHandle()
                procs[u].init(handles[u])
                twin_state[u] = FakeSessionGroupState()
            list(procs[u].handleInputRows((u,), [_ts_batch(evs)], None))
            list(_session_fn(GAP)((u,), [_ts_batch(evs)], twin_state[u]))
        # fire expired timers once the watermark passes them — the
        # runtime contract for BOTH APIs
        for u in procs:
            for t in list(handles[u].listTimers()):
                if t <= wm:
                    handles[u].deleteTimer(t)  # runtime removes on fire
                    out = list(
                        procs[u].handleExpiredTimer(
                            (u,), None, FakeExpiredTimerInfo(t)
                        )
                    )
                    tws_closed += [r for o in out for _, r in o.iterrows()]
            st = twin_state[u]
            if st.exists and st.timeout_ms is not None and st.timeout_ms <= wm:
                st.hasTimedOut = True
                out = list(_session_fn(GAP)((u,), [], st))
                st.hasTimedOut = False
                twin_closed += [r for o in out for _, r in o.iterrows()]

    def norm(rows):
        return sorted(
            (
                int(r["user_id"]),
                r["session_start"].value,
                r["session_end"].value,
                int(r["n_events"]),
            )
            for r in rows
        )

    assert norm(tws_closed) == norm(twin_closed)
    assert len(tws_closed) == 4  # two users × two sessions each
    # the extended session closed at its EXTENDED end, not the first one
    u1 = [r for r in tws_closed if int(r["user_id"]) == 1]
    first = min(u1, key=lambda r: r["session_end"].value)
    assert first["session_end"].value // 1_000_000 == 2_000
    assert int(first["n_events"]) == 3


def test_session_processor_rearm_deletes_stale_alarm():
    """Extending a session must leave exactly ONE armed timer (the new
    alarm): with accumulating TWS timers, a leftover stale alarm would
    fire at old_end + gap and close the session early."""
    from data_engineering_project_spotify_app_spark.streaming.tws import (
        SessionProcessor,
    )

    p = SessionProcessor(1_000)
    h = FakeTimerHandle()
    p.init(h)
    list(p.handleInputRows((1,), [_ts_batch([1_000])], None))
    assert sorted(h.listTimers()) == [2_000]
    list(p.handleInputRows((1,), [_ts_batch([1_800])], None))
    assert sorted(h.listTimers()) == [2_800]  # stale 2_000 deleted
