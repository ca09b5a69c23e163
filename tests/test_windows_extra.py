"""Pandas references for the rolling-median and active-users panels."""

from __future__ import annotations

from data_engineering_project_spotify_app_spark.operators.windows import (
    q_active_users,
    q_rolling_median,
)
from data_engineering_project_spotify_app_spark.tables import table


def test_rolling_median_matches_pandas(spark, sf_dir):
    e = table(spark, sf_dir, "events").toPandas()
    e["day"] = e["ts"].dt.date
    daily = (
        e.groupby(["event_type", "day"])["value"]
        .sum()
        .round(4)
        .reset_index(name="total")
        .sort_values(["event_type", "day"])
    )
    got = {
        (r["event_type"], r["day"]): (r["total"], r["med7"])
        for r in q_rolling_median(spark, sf_dir).collect()
    }
    assert len(got) == len(daily)
    for etype, g in daily.groupby("event_type"):
        med = g["total"].rolling(7, min_periods=1).median()
        for (_, row), m in zip(g.iterrows(), med):
            tot, med7 = got[(etype, row["day"])]
            assert abs(tot - row["total"]) < 1e-9
            assert abs(med7 - round(m, 4)) < 1e-9, (etype, row["day"])


def test_active_users_invariants(spark, sf_dir):
    rows = sorted(q_active_users(spark, sf_dir).collect(), key=lambda r: r["day"])
    e = table(spark, sf_dir, "events").toPandas()
    total_users = e["user_id"].nunique()
    cum = 0
    for r in rows:
        cum += r["new_users"]
        assert r["cumulative_users"] == cum
        assert r["new_users"] <= r["dau"]
    assert rows[-1]["cumulative_users"] == total_users
    assert rows[0]["new_users"] == rows[0]["dau"]  # day 1: everyone is new


def test_rolling_dau_brackets_daily_dau(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.windows import (
        q_rolling_dau,
    )

    dau = {r["day"]: r["dau"] for r in q_active_users(spark, sf_dir).collect()}
    total = table(spark, sf_dir, "events").select("user_id").distinct().count()
    rows = sorted(q_rolling_dau(spark, sf_dir).collect(), key=lambda r: r["day"])
    assert {r["day"] for r in rows} == set(dau)
    first = rows[0]
    assert first["dau7"] == dau[first["day"]]  # day 1: window is just day 1
    for r in rows:
        assert dau[r["day"]] <= r["dau7"] <= total


def test_readability_matches_python(spark, sf_dir):
    import re

    from data_engineering_project_spotify_app_spark.operators.textops import (
        q_readability,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    got = {r["doc_id"]: r for r in q_readability(spark, sf_dir).collect()}
    checked = 0
    for doc_id, text in list(docs.items())[:50]:
        words = len(re.findall(r"[a-z0-9]+", text.lower()))
        if words == 0:
            assert doc_id not in got
            continue
        r = got[doc_id]
        sents = max(len(re.findall(r"[.!?]+", text)), 1)
        syl = len(re.findall(r"[aeiouy]+", text.lower()))
        assert r["n_sentences"] == sents
        assert r["n_syllables"] == syl
        flesch = 206.835 - 1.015 * (r["n_words"] / sents) - 84.6 * (
            syl / r["n_words"]
        )
        assert abs(r["flesch"] - round(flesch, 4)) < 1e-9
        checked += 1
    assert checked > 10


def test_stickiness_bounds_and_reconciliation(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.windows import (
        q_rolling_dau,
        q_stickiness,
    )

    wau7 = {r["day"]: r["dau7"] for r in q_rolling_dau(spark, sf_dir).collect()}
    rows = q_stickiness(spark, sf_dir).collect()
    assert {r["day"] for r in rows} == set(wau7)
    for r in rows:
        assert r["wau"] == wau7[r["day"]]  # same trailing-distinct
        assert 0 < r["stickiness"] <= 1.0 + 1e-9
        assert r["dau"] <= r["wau"]
