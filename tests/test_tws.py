"""transformWithStateInPandas (Spark 4 stateful API): accumulates across
micro-batches and agrees with the applyInPandasWithState twin.

The TWS runtime speaks protobuf to its state server; this container has
no usable google.protobuf, so the end-to-end test skips here (the
applyInPandasWithState twin in test_stateful_streaming.py carries the
stateful-semantics coverage). The skip is import-gated, not hardcoded —
the test runs wherever protobuf exists.
"""

from __future__ import annotations

import json

import pytest

try:  # TWS runtime dependency — absent in this container
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs google.protobuf (not in container)",
)

from data_engineering_project_spotify_app_spark.streaming.stateful import (
    user_profiles,
)
from data_engineering_project_spotify_app_spark.streaming.stream_ops import (
    stream_events,
)
from data_engineering_project_spotify_app_spark.streaming.tws import (
    user_profiles_tws,
)


def _write_batch(d, name, rows):
    with open(d / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(i, user, value):
    return {
        "event_id": i,
        "ts": f"2024-01-01T00:{i % 60:02d}:00.000Z",
        "user_id": user,
        "event_type": "click",
        "value": value,
        "props": "{}",
    }


ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _final_profiles(spark, d, op, sink_name):
    stream = stream_events(spark, str(d), max_files_per_trigger=1)
    q = (
        op(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        f"SELECT * FROM {sink_name}"
    ).collect()
    # update mode re-emits per batch; collect() row order across
    # micro-batches is not contractual, so pick the final state
    # order-independently: n_events grows monotonically per user, so the
    # row with the max n_events is the last state update.
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (
                r["n_events"],
                r["total_value"],
                r["max_value"],
            )
    return final


def test_tws_accumulates_and_matches_old_api(spark, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    _write_batch(
        d, "b0.json", [_ev(1, 7, 10.0), _ev(2, 7, 20.0), _ev(3, 8, 5.0)]
    )
    _write_batch(
        d, "b1.json", [_ev(4, 7, 30.0), _ev(5, 8, 2.5), _ev(6, 9, 1.0)]
    )
    # transformWithState requires the RocksDB state store provider (the
    # default HDFS-backed store does not implement its column families)
    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        new_api = _final_profiles(spark, d, user_profiles_tws, "tws_profiles")
    finally:
        if old_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )
    old_api = _final_profiles(spark, d, user_profiles, "old_profiles")
    assert new_api == old_api
    assert new_api[7] == (3, 60.0, 30.0)
    assert new_api[8] == (2, 7.5, 5.0)
    assert new_api[9] == (1, 1.0, 1.0)


def _ev_at(i, user, hour, minute):
    return {
        "event_id": i,
        "ts": f"2024-01-01T{hour:02d}:{minute:02d}:00.000Z",
        "user_id": user,
        "event_type": "click",
        "value": 1.0,
        "props": "{}",
    }


def _closed_sessions_of(spark, d, op, sink_name):
    stream = stream_events(spark, str(d), max_files_per_trigger=1).withWatermark(
        "ts", "10 minutes"
    )
    q = (
        op(stream, gap_ms=30 * 60 * 1000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {sink_name}").collect()
    )


def test_tws_timer_sessions_match_old_api(spark, tmp_path):
    """closed_sessions_tws (registerTimer, EventTime time mode) closes
    the same sessions as the applyInPandasWithState twin
    (EventTimeTimeout) on an identical file stream — the TIMER half of
    the TWS surface, end to end. Import-gated like the profile test."""
    from data_engineering_project_spotify_app_spark.streaming.stateful import (
        closed_sessions,
    )
    from data_engineering_project_spotify_app_spark.streaming.tws import (
        closed_sessions_tws,
    )

    d = tmp_path / "sess_stream"
    d.mkdir()
    # user 7: session [10:00, 10:05]; user 8's late event extends the
    # re-arm path; final batch advances the watermark past every gap
    _write_batch(
        d, "b0.json", [_ev_at(1, 7, 10, 0), _ev_at(2, 7, 10, 5), _ev_at(3, 8, 10, 2)]
    )
    _write_batch(d, "b1.json", [_ev_at(4, 8, 10, 20)])
    _write_batch(d, "b2.json", [_ev_at(5, 9, 14, 0)])
    _write_batch(d, "b3.json", [_ev_at(6, 9, 14, 5)])
    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        new_api = _closed_sessions_of(
            spark, d, closed_sessions_tws, "tws_sessions"
        )
    finally:
        if old_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )
    old_api = _closed_sessions_of(spark, d, closed_sessions, "old_sessions")
    assert new_api == old_api
    closed_users = [u for u, *_ in new_api]
    assert 7 in closed_users and 8 in closed_users
