"""GROUPED_AGG UDAF surface: the mergeable KMV sketch column."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.functions.udafs import (
    kmv_estimate,
    kmv_merge_arrays,
    kmv_sketch_udaf,
)
from data_engineering_project_spotify_app_spark.operators.extras import KMV_K
from data_engineering_project_spotify_app_spark.operators.registry import (
    QUERIES,
    load_all_modules,
)


def _hashed_lineitem(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.tables import table

    return table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 8), "
            "16, 10) AS BIGINT)"
        ).alias("hv"),
    )


def test_udaf_sketch_matches_expression_kmv(spark, sf_dir):
    """Per-group estimate from the UDAF sketch must equal the
    registered expression-based q_kmv_distinct exactly (same hash
    space, same closed form)."""
    load_all_modules()
    h = _hashed_lineitem(spark, sf_dir)
    sk = h.groupBy("l_returnflag").agg(
        kmv_sketch_udaf().alias("sketch")
    )
    got = {
        r["l_returnflag"]: round(r["est"], 1)
        for r in sk.select(
            "l_returnflag", kmv_estimate(F.col("sketch")).alias("est")
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["est_distinct"]
        for r in QUERIES["q_kmv_distinct"](spark, sf_dir).collect()
    }
    assert got == want


def test_udaf_sketch_merge_is_lossless(spark, sf_dir):
    """Merging two shard sketches (hash-split of the rows) must equal
    the sketch of the union — the mergeability contract that lets
    shards aggregate without touching raw rows."""
    h = _hashed_lineitem(spark, sf_dir).filter("l_returnflag = 'A'")
    full = h.groupBy("l_returnflag").agg(
        kmv_sketch_udaf().alias("sketch")
    )
    halves = (
        h.withColumn("shard", (F.col("hv") % 2).cast("int"))
        .groupBy("l_returnflag", "shard")
        .agg(kmv_sketch_udaf().alias("sketch"))
    )
    a, b = [r["sketch"] for r in halves.collect()]
    merged = spark.createDataFrame(
        [(a, b)], "a array<bigint>, b array<bigint>"
    ).select(
        kmv_merge_arrays(F.col("a"), F.col("b")).alias("m")
    ).collect()[0]["m"]
    assert merged == full.collect()[0]["sketch"][:KMV_K]
