"""Bucketed tables: the co-located-join scale posture, asserted.

At 100 TB, re-shuffling the fact table for every join on the same key is
the dominant avoidable cost. Bucketing both sides on the join key at
write time makes the join a zero-exchange merge of pre-hashed files —
this test proves the engine's bucketed-write path actually removes the
exchanges from the plan.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.tables import table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf — write external bucketed tables
    # under tmp_path instead
    lineitem = table(spark, SF, "lineitem")
    orders = table(spark, SF, "orders")
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord"))
        .saveAsTable("ord_bucketed")
    )
    li = spark.table("li_bucketed")
    od = spark.table("ord_bucketed")
    # disable broadcast so the join would OTHERWISE be a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # bucketed sides: no Exchange feeding the join
        assert "Exchange hashpartitioning(l_orderkey" not in join_section
        assert "Exchange hashpartitioning(o_orderkey" not in join_section
        # and results are right
        n = joined.agg(F.sum("n")).first()[0]
        assert n == lineitem.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
