"""Data-quality operators: profiling and constraint validation.

The reference's only validation is runtime guards and BigQuery's
load-time schema check (SURVEY.md §5); a pipeline landing 100 TB runs
explicit quality gates instead: per-column profiles (the stats a human
checks before trusting a table) and declared-constraint violation counts
(the checks that fail the batch before bad data propagates). Both are
single-pass aggregates / anti-joins — no new machinery, which is the
point: quality gates must be cheap enough to run on every load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table


@query(
    "q_profile",
    oracle="""
    SELECT 'o_orderkey' AS col,
           count(*) AS n_rows,
           count(o_orderkey) AS n_nonnull,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num,
           CAST(max(o_orderkey) AS DOUBLE) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(o_orderpriority),
           count(DISTINCT o_orderpriority), NULL, NULL
    FROM orders
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders``: rows / non-nulls / distincts /
    numeric range per column, one output row per column.

    Scale: ONE scan — every per-column statistic is an aggregate over
    the same pass (Spark computes all of them in a single partial-agg
    pipeline); the per-column rows are unpivoted from that one result,
    not one job per column. count(DISTINCT a, b, c) in one aggregate
    triggers Spark's expand-based rewrite (3× the rows through the
    shuffle) — acceptable for 3 columns, swap to approx_count_distinct
    at wider schemas.
    """
    o = table(spark, sf_dir, "orders")
    row = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("double").alias("min_key"),
        F.max("o_orderkey").cast("double").alias("max_key"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
    )
    null_d = F.lit(None).cast("double")
    return row.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderkey").alias("col"),
                    F.col("n_rows"),
                    F.col("nn_key").alias("n_nonnull"),
                    F.col("nd_key").alias("n_distinct"),
                    F.col("min_key").alias("min_num"),
                    F.col("max_key").alias("max_num"),
                ),
                F.struct(
                    F.lit("o_totalprice").alias("col"),
                    F.col("n_rows"),
                    F.col("nn_price").alias("n_nonnull"),
                    F.col("nd_price").alias("n_distinct"),
                    F.col("min_price").alias("min_num"),
                    F.col("max_price").alias("max_num"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col"),
                    F.col("n_rows"),
                    F.col("nn_prio").alias("n_nonnull"),
                    F.col("nd_prio").alias("n_distinct"),
                    null_d.alias("min_num"),
                    null_d.alias("max_num"),
                ),
            )
        ).alias("s")
    ).select("s.*")


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'lineitem.quantity_in_range' AS check_name,
           count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
             AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.discount_in_range',
           count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
    FROM lineitem
    UNION ALL
    SELECT 'orders.orphan_custkey',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    FROM (SELECT 1)
    UNION ALL
    SELECT 'lineitem.orphan_orderkey',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    FROM (SELECT 1)
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-violation counts: range checks and referential
    integrity (orphan foreign keys), one row per declared check.

    Scale: range checks are conditional counts inside the table's one
    scan; orphan checks are left-anti joins against the parent's key
    column only (broadcast when the parent's keys fit, shuffled
    otherwise — never a full-row join). A failing gate stops the load
    before bad rows propagate into downstream tables — the engine-side
    replacement for the reference's trust-the-API posture.
    """
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li_checks = l.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("qty"),
        F.count(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1
            )
        ).alias("disc"),
    )
    orphan_orders = (
        o.join(
            c.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n"))
    )
    orphan_lines = (
        l.join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n"))
    )
    return (
        li_checks.select(
            F.lit("lineitem.quantity_in_range").alias("check_name"),
            F.col("qty").alias("n_violations"),
        )
        .unionByName(
            li_checks.select(
                F.lit("lineitem.discount_in_range").alias("check_name"),
                F.col("disc").alias("n_violations"),
            )
        )
        .unionByName(
            orphan_orders.select(
                F.lit("orders.orphan_custkey").alias("check_name"),
                F.col("n").alias("n_violations"),
            )
        )
        .unionByName(
            orphan_lines.select(
                F.lit("lineitem.orphan_orderkey").alias("check_name"),
                F.col("n").alias("n_violations"),
            )
        )
    )


N_HIST_BUCKETS = 10


@query(
    "q_histogram",
    oracle=f"""
    WITH stats AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - lo)
                            / ((hi - lo) / {N_HIST_BUCKETS}.0)),
                      {N_HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
           count(*) AS n_rows,
           round(min(o_totalprice), 2) AS bucket_min,
           round(max(o_totalprice), 2) AS bucket_max
    FROM orders CROSS JOIN stats
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: the distribution profile a
    quality gate compares run-over-run to catch data drift.

    Scale: two passes — a 1-row min/max broadcast, then one scan with a
    pure-arithmetic bucket expression folded into the groupBy (10
    groups, map-side combined). The max value lands in the last bucket
    via the least() clamp; identical float arithmetic on both engines.
    """
    o = table(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / float(N_HIST_BUCKETS)
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        F.lit(N_HIST_BUCKETS - 1),
    ).cast("bigint")
    return (
        o.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@query(
    "q_schema_evolution_union",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority,
           'v1' AS source_version
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE), o_orderpriority, 'v2'
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across schema versions: a v1 load (has price, no priority)
    and a v2 load (priority added, price dropped) combined by NAME with
    missing columns null-filled.

    The ingestion reality the reference's fixed bq-load schema papers
    over: upstream payloads gain and lose fields between loads.
    ``unionByName(allowMissingColumns=True)`` is the engine primitive —
    positional UNION would silently misalign columns; the by-name form
    is order-proof and null-fills exactly like the declared-schema load
    (SURVEY.md §1.2's lenient-extract / strict-landing contract).

    Scale: a metadata-only operation — no shuffle, each side keeps its
    scan; the null fill is a constant column.
    """
    o = table(spark, sf_dir, "orders")
    v1 = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("source_version", F.lit("v1"))
    )
    v2 = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .withColumn("source_version", F.lit("v2"))
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
        "source_version",
    )


@query(
    "q_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type,
             avg(value) AS m,
             stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.m) / s.sd, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.m) / s.sd) > 3
    """,
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: rows more than 3 sample
    standard deviations from their event type's mean — the data-quality
    screen that feeds quarantine/review queues in an ingest pipeline.

    Scale: group stats are one map-side-combined aggregation collapsed
    to #groups rows, broadcast back onto the fact scan — the fact table
    is read twice but never shuffled. Cross-engine note: avg/stddev sum
    order differs between engines in the last ulp, so z is rounded for
    output; the |z| > 3 cut uses the unrounded value on both sides
    (knife-edge ties are ~1e-12-probability, same convention as the
    suite's other statistical thresholds).
    """
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("sd"),
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("z"),
        )
    )


_COMPLETENESS_ORACLE = """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT d.day, t.event_type FROM days d, types t),
    obs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, event_type FROM events
    )
    SELECT g.event_type,
           CAST(count(*) AS BIGINT) AS expected_days,
           CAST(sum(CASE WHEN o.day IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS observed_days,
           round(sum(CASE WHEN o.day IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS completeness
    FROM grid g
    LEFT JOIN obs o ON o.day = g.day AND o.event_type = g.event_type
    GROUP BY 1
    """


@query("q_feed_completeness", oracle=_COMPLETENESS_ORACLE)
def q_feed_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-completeness monitor: for every event type, the fraction of
    observed calendar days on which the type actually landed — a cell
    missing from the (day × type) grid is a silently-broken upstream
    producer, the failure mode volume anomaly detectors miss when the
    OTHER types keep flowing (completes the DQ ladder next to
    q_dq_checks' row-level rules and q_control_chart's volume limits).

    Scale: the grid is |days|×|types| (tiny) built from two distinct
    pre-aggregates; the presence probe is one more distinct
    pre-aggregate left-joined to it — the corpus is scanned twice,
    reduced immediately both times.
    """
    e = table(spark, sf_dir, "events")
    days = e.select(F.to_date("ts").alias("day")).distinct()
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    obs = (
        e.select(F.to_date("ts").alias("day"), "event_type")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    return (
        grid.join(obs, ["day", "event_type"], "left")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("expected_days"),
            F.sum(
                F.when(F.col("present").isNotNull(), 1).otherwise(0)
            ).alias("observed_days"),
            F.round(
                F.sum(
                    F.when(F.col("present").isNotNull(), 1).otherwise(0)
                )
                / F.count("*"),
                6,
            ).alias("completeness"),
        )
    )
