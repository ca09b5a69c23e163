"""Bucketed landings: the co-located-join contract, plan-asserted.

The whole point of sources/bucketed.py is shuffle ELISION — so the
tests assert the executed plan, not just the rows: a join of two
co-bucketed tables must contain no Exchange, and must still produce
exactly the rows of the plain (shuffled) join.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.sources.bucketed import (
    bucketed_join,
    drop_landed,
    land_bucketed,
)
from data_engineering_project_spotify_app_spark.tables import table

N_BUCKETS = 4


@contextmanager
def _conf(spark, key: str, value: str):
    """Set a SQL conf for the block, restoring the SAVED value after
    (not a hardcoded default — the session's builder value must
    survive the test whatever it was)."""
    saved = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


@pytest.fixture()
def landed(spark, sf_dir):
    """Orders + lineitem landed co-bucketed on the order key."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_custkey", "o_totalprice"
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_partkey", "l_quantity"
    )
    land_bucketed(o, "t_orders_b", "okey", N_BUCKETS)
    land_bucketed(li, "t_lineitem_b", "okey", N_BUCKETS)
    yield o, li
    drop_landed(spark, "t_orders_b", "t_lineitem_b")


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, landed):
    """Matched bucket counts ⇒ the join reads co-located buckets: zero
    Exchange operators anywhere in the executed plan (broadcast is
    disabled for the assertion so AQE can't hide a shuffle elision
    behind a broadcast)."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plan = _executed(
            bucketed_join(spark, "t_orders_b", "t_lineitem_b", "okey")
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark, landed):
    o, li = landed
    got = sorted(
        tuple(r)
        for r in bucketed_join(
            spark, "t_orders_b", "t_lineitem_b", "okey"
        ).collect()
    )
    want = sorted(tuple(r) for r in o.join(li, "okey").collect())
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, landed):
    """Aggregation on the bucket key also rides the landing's
    partitioning: no Exchange before the final aggregate."""
    agg = (
        spark.table("t_lineitem_b")
        .groupBy("okey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = _executed(agg)
    assert "Exchange" not in plan, plan


def test_land_bucketed_writes_one_file_per_bucket(spark, landed):
    """land_bucketed's pre-write repartition(n_buckets, key) must yield
    EXACTLY one file per bucket — the invariant that makes write-time
    sort order trustworthy (and the precondition for the legacy
    outputOrdering flag below; with a second file per bucket that flag
    silently returns wrong sort-merge results)."""
    for t in ("t_orders_b", "t_lineitem_b"):
        n_files = (
            spark.table(t)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert n_files == N_BUCKETS, (t, n_files)


def test_sorted_single_file_buckets_need_no_presort(spark, landed):
    """One overwrite write ⇒ one file per bucket ⇒ sortBy order is
    usable directly: the SMJ's children contain no Sort operators.

    Since SPARK-28595 (3.0) the scan only trusts write-time sort order
    under ``spark.sql.legacy.bucketedTableScan.outputOrdering`` — a
    flag that returns WRONG join results if any bucket has >1 file, so
    it is (a) guarded here by re-checking the one-file-per-bucket
    invariant right before enabling it, and (b) enabled only inside
    this block, never in session defaults; without the flag the plan
    keeps a cheap Sort of already-sorted buckets but still no
    Exchange — the elision that actually matters."""
    for t in ("t_orders_b", "t_lineitem_b"):
        n_files = (
            spark.table(t)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert n_files == N_BUCKETS, f"{t}: {n_files} files — flag unsafe"
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), _conf(
        spark, "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    ):
        plan = _executed(
            bucketed_join(spark, "t_orders_b", "t_lineitem_b", "okey")
        )
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
