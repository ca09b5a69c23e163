"""attribution_stream vs the batch last-touch window: equivalence under
in-order arrival, state carry across micro-batches."""

from __future__ import annotations

import json
import os

from data_engineering_project_spotify_app_spark.streaming.stateful import (
    attribution_stream,
)
from data_engineering_project_spotify_app_spark.streaming.stream_ops import (
    stream_events,
)


def _drop(d, name, rows):
    with open(os.path.join(d, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(i, user, etype, mm, value=1.0):
    return {
        "event_id": i,
        "ts": f"2024-01-01T10:{mm:02d}:00.000Z",
        "user_id": user,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


def test_attribution_stream_matches_batch_semantics(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: user 1 clicks then purchases (-> click); user 2 purchases
    # cold (-> direct); user 1's trailing view updates state only.
    _drop(
        src,
        "b0.json",
        [
            _ev(1, 1, "click", 0),
            _ev(2, 1, "purchase", 1, value=10.0),
            _ev(3, 2, "purchase", 2, value=7.0),
            _ev(4, 1, "view", 3),
        ],
    )
    q = (
        attribution_stream(stream_events(spark, src))
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r["event_id"]: r for r in spark.sql("SELECT * FROM attrib").collect()
        }
        assert got1[2]["attributed_type"] == "click"
        assert got1[3]["attributed_type"] == "direct"
        assert set(got1) == {2, 3}  # the view emits nothing

        # batch 2: user 1 purchases again — state must carry the VIEW
        # from batch 1 (not the click); purchase trains credit it too.
        _drop(
            src,
            "b1.json",
            [
                _ev(5, 1, "purchase", 10, value=3.0),
                _ev(6, 1, "purchase", 11, value=4.0),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: r for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got[5]["attributed_type"] == "view"
    assert got[6]["attributed_type"] == "view"
    assert got[5]["value"] == 3.0
