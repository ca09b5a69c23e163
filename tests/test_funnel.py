"""Funnel state machine: crafted edge cases the dense fixture can't hit
(every synthetic user reaches stage 3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.funnel import q_funnel


def _run_on(spark, rows):
    """Run q_funnel's transformation on literal events via a temp parquet
    dir — exercises the exact registered query code path."""
    import tempfile

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return {r["user_id"]: r for r in q_funnel(spark, d).collect()}


def _ev(i, user, etype, minute, second=0):
    return (
        i,
        dt.datetime(2024, 1, 1, 0, minute, second),
        user,
        etype,
        1.0,
        "{}",
    )


def test_funnel_state_machine_edges(spark):
    rows = [
        # user 1: full ordered funnel
        _ev(1, 1, "view", 1),
        _ev(2, 1, "click", 2),
        _ev(3, 1, "purchase", 3),
        # user 2: purchase BEFORE view/click — must not count
        _ev(4, 2, "purchase", 1),
        _ev(5, 2, "view", 2),
        _ev(6, 2, "click", 3),
        # user 3: click only — stage 0 (no view first)
        _ev(7, 3, "click", 1),
        # user 4: view then click in the SAME second — strict > blocks
        _ev(8, 4, "view", 5),
        _ev(9, 4, "click", 5),
        # user 5: view, click, then a second view/click; purchase after
        _ev(10, 5, "view", 1),
        _ev(11, 5, "click", 2),
        _ev(12, 5, "view", 3),
        _ev(13, 5, "purchase", 4),
    ]
    got = _run_on(spark, rows)
    assert got[1]["funnel_stage"] == 3
    assert got[1]["t_purchase"] == dt.datetime(2024, 1, 1, 0, 3)
    assert got[2]["funnel_stage"] == 2  # view→click, purchase was too early
    assert got[2]["t_purchase"] is None
    assert got[3]["funnel_stage"] == 0
    assert got[4]["funnel_stage"] == 1  # tie does not advance
    assert got[5]["funnel_stage"] == 3
    # first view wins; later views don't reset
    assert got[5]["t_view"] == dt.datetime(2024, 1, 1, 0, 1)


def test_funnel_is_one_shuffle(spark, sf_dir):
    """The fold must cost exactly one exchange (groupBy user_id)."""
    import io
    import contextlib
    import re

    df = q_funnel(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
