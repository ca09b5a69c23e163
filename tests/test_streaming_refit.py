"""burst_detect_refit: per-batch baseline re-fit via foreachBatch.

Batch 1 lands three history days (no baseline yet → z NULL); batch 2's
spike is scored against a baseline freshly fit from batch 1's days —
the "train on history, score the live window" loop, end to end.
"""

from __future__ import annotations

import json
import math
import os

from data_engineering_project_spotify_app_spark.streaming.stream_ops import (
    burst_detect_refit,
    stream_events,
)


def _drop(d, name, rows):
    with open(os.path.join(d, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(i, etype, day, mm):
    return {
        "event_id": i,
        "ts": f"2024-01-{day:02d}T10:{mm:02d}:00.000Z",
        "user_id": 1,
        "event_type": etype,
        "value": 1.0,
        "props": "{}",
    }


def test_refit_scores_batch2_against_batch1_history(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    os.makedirs(src)
    i = 0
    hist = []
    for day, n in ((1, 5), (2, 7), (3, 6)):
        for _ in range(n):
            hist.append(_ev(i, "click", day, i % 60))
            i += 1
    _drop(src, "b0.json", hist)

    q = (
        burst_detect_refit(stream_events(spark, src), store)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        flags1 = spark.read.parquet(os.path.join(store, "flags"))
        r1 = {
            (str(r["day"]), r["event_type"]): r for r in flags1.collect()
        }
        assert len(r1) == 3
        # No store before batch 1: every day flows with z NULL.
        assert all(r["z"] is None and r["is_burst"] is None for r in r1.values())

        spike = [_ev(1000 + k, "click", 4, k % 60) for k in range(20)]
        spike.append(_ev(2000, "scroll", 4, 0))
        _drop(src, "b1.json", spike)
        q.processAllAvailable()
    finally:
        q.stop()

    flags = spark.read.parquet(os.path.join(store, "flags"))
    r2 = {
        (str(r["day"]), r["event_type"]): r
        for r in flags.filter("epoch = 1").collect()
    }
    assert set(r2) == {("2024-01-04", "click"), ("2024-01-04", "scroll")}
    click = r2[("2024-01-04", "click")]
    sd = math.sqrt(((5 - 6) ** 2 + (7 - 6) ** 2 + (6 - 6) ** 2) / 3)
    assert click["n_events"] == 20
    assert abs(click["z"] - round((20 - 6) / sd, 4)) < 1e-3
    assert click["is_burst"] is True
    scroll = r2[("2024-01-04", "scroll")]
    assert scroll["n_events"] == 1
    assert scroll["z"] is None and scroll["is_burst"] is None

    # Store is merge-on-read: day sums across appended partials.
    day_sums = {
        (r["event_type"], str(r["day"])): r["total"]
        for r in spark.read.parquet(os.path.join(store, "daycounts"))
        .groupBy("event_type", "day")
        .sum("n")
        .withColumnRenamed("sum(n)", "total")
        .collect()
    }
    assert day_sums[("click", "2024-01-01")] == 5
    assert day_sums[("click", "2024-01-04")] == 20
    assert day_sums[("scroll", "2024-01-04")] == 1


def test_replayed_refit_epoch_does_not_double_count(spark, tmp_path):
    """A replayed epoch must not inflate the day-count store (a
    double-appended slice would skew every later baseline's mu/sd) nor
    duplicate flag rows — the per-epoch overwrite-partition contract."""
    import json
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        {
            "event_id": i,
            "ts": f"2024-01-0{1 + i % 3}T00:00:00.000Z",
            "user_id": i % 5,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
        for i in range(30)
    ]
    with open(os.path.join(src, "b0.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    store = str(tmp_path / "store")
    q = (
        burst_detect_refit(stream_events(spark, src), store)
        .queryName("refit_replay")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.05)
    finally:
        q.stop()
    counts_path = os.path.join(store, "daycounts")
    before = sorted(
        (str(r["day"]), r["event_type"], r["n"])
        for r in spark.read.parquet(counts_path).collect()
    )
    n_flags_before = spark.read.parquet(
        os.path.join(store, "flags")
    ).count()
    # replay epoch 0 by hand (simulates a foreachBatch retry)
    q2 = (
        burst_detect_refit(stream_events(spark, src), store)
        .queryName("refit_replay2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after = sorted(
        (str(r["day"]), r["event_type"], r["n"])
        for r in spark.read.parquet(counts_path).collect()
    )
    assert after == before
    assert (
        spark.read.parquet(os.path.join(store, "flags")).count()
        == n_flags_before
    )
