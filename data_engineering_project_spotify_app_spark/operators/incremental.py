"""Incremental aggregate maintenance: merge partial states instead of
recomputing the world.

At 100 TB the daily rollup job cannot re-scan history; it keeps the
aggregate table in *mergeable partial* form (count + sum per group — the
algebraic decomposition every distributive/algebraic aggregate has) and
folds each new increment in with one small groupBy over (old state ∪
delta). avg is finalized from sum/count at read time; min/max/sum/count
merge directly. This is the batch twin of what Structured Streaming's
state store does per micro-batch (streaming/stream_ops.py), and the
maintenance discipline behind every materialized view.

The operator is exactly oracle-checkable: the oracle recomputes the
rollup from ALL events in one pass — merged partials must equal the
full recompute bit-for-bit (counts/sums are exact; avg is finalized
identically on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

CUTOVER = "2024-02-01"  # base = events before, delta = events on/after


def _partials(df: DataFrame) -> DataFrame:
    """Mergeable partial state per (event_type): count, sum, min, max."""
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        # DECIMAL, not double: the merged sum adds partials in a
        # different order than the oracle's single pass — decimal
        # aggregation is exact and order-independent, so merge == full
        # recompute bit-for-bit (same convention as q_tpch_q10).
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_partials(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta's partial state into the base's: one tiny groupBy
    over the union of two aggregate tables (rows ∝ #groups, not #events).
    """
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


@query(
    "q_incremental_rollup",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))) / count(*), 4)
                AS DOUBLE) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup maintained incrementally (base partials + delta partials,
    merged) — must equal the oracle's full single-pass recompute.

    The split point is arbitrary (any prior state + any increment); the
    equality holds because every aggregate kept is algebraic: count and
    sum merge by sum, min/max by min/max, avg finalizes as sum/n.

    Scale: the merge input is two aggregate TABLES (#groups rows each),
    so maintenance cost is O(delta scan + groups), independent of
    history size. Rounding happens only at finalization — merging
    pre-rounded partials would drift.
    """
    e = table(spark, sf_dir, "events")
    cut = F.lit(CUTOVER).cast("timestamp")
    base = _partials(e.filter(F.col("ts") < cut))
    delta = _partials(e.filter(F.col("ts") >= cut))
    merged = merge_partials(base, delta)
    return merged.select(
        "event_type",
        "n",
        F.round("sum_value", 2).cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        F.round(F.col("sum_value") / F.col("n"), 4)
        .cast("double")
        .alias("avg_value"),
    )
