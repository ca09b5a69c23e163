"""Bucketed landings: the co-located-join contract, plan-asserted.

The whole point of sources/bucketed.py is shuffle ELISION — so the
tests assert the executed plan, not just the rows: a join of two
co-bucketed tables must contain no Exchange, and must still produce
exactly the rows of the plain (shuffled) join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.sources.bucketed import (
    bucketed_join,
    drop_landed,
    land_bucketed,
)
from data_engineering_project_spotify_app_spark.tables import table


@pytest.fixture()
def landed(spark, sf_dir):
    """Orders + lineitem landed co-bucketed on the order key."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_custkey", "o_totalprice"
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_partkey", "l_quantity"
    )
    land_bucketed(o, "t_orders_b", "okey", 4)
    land_bucketed(li, "t_lineitem_b", "okey", 4)
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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(bucketed_join(spark, "t_orders_b", "t_lineitem_b", "okey"))
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


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


def test_sorted_single_file_buckets_need_no_presort(spark, landed):
    """One overwrite write ⇒ one file per bucket ⇒ sortBy order is
    usable directly: the SMJ's children contain no Sort operators.

    Since SPARK-28595 (3.0) the scan only trusts write-time sort order
    under ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (on by
    choice here, safe exactly because land_bucketed's repartition
    guarantees the one-file-per-bucket invariant the flag assumes);
    without the flag the plan keeps a cheap Sort of already-sorted
    buckets but still no Exchange — the elision that actually matters."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        plan = _executed(bucketed_join(spark, "t_orders_b", "t_lineitem_b", "okey"))
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
