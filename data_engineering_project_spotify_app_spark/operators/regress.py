"""Distributed regression & correlation panels — closed-form GLM-lite.

Simple linear regression and Pearson correlation are one-pass
closed-form aggregates (sums of x, y, xy, x², y²), which makes them the
rare "ML" operators that run at 100 TB as plain partial-aggregated
hash aggregations — no iteration, no driver round-trips, no UDFs. Both
engines expose the SQL-standard aggregate forms (regr_slope /
regr_intercept / regr_r2 / corr), so the oracle is the identical
aggregate over the identical frame.

Double discipline: ln() feeds the elasticity aggregation (libm may
differ in the last ulp across engines), but the closed-form estimates
divide large correlated sums, so the relative error stays ~1e-12 and
round(6) absorbs it — same argument as the PMI family (search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table


_ELASTICITY_ORACLE = """
    WITH x AS (
      SELECT p.p_brand AS brand,
             ln(l.l_extendedprice / l.l_quantity) AS lp,
             ln(l.l_quantity) AS lq
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    )
    SELECT brand,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(lq, lp), 6) AS elasticity,
           round(regr_intercept(lq, lp), 6) AS intercept,
           round(regr_r2(lq, lp), 6) AS r2
    FROM x GROUP BY brand
    """


@query("q_price_elasticity", oracle=_ELASTICITY_ORACLE)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the slope of
    ln(quantity) on ln(unit price) — one closed-form OLS per group,
    entirely inside a hash aggregate (regr_* are sum-based partial
    aggregates; the fact table is scanned once, shuffled once by
    brand-sized keys).

    TPC-H's uniform quantity draw makes the fixture's slopes hover
    near 0 with tiny r² — the numbers are a fixture artifact; the
    OPERATOR (grouped one-pass OLS) is the deliverable.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("lp"),
        F.log("l_quantity").alias("lq"),
    )
    return x.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope("lq", "lp"), 6).alias("elasticity"),
        F.round(F.regr_intercept("lq", "lp"), 6).alias("intercept"),
        F.round(F.regr_r2("lq", "lp"), 6).alias("r2"),
    )


_TYPE_CORR_ORACLE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(CAST(a.n AS DOUBLE), CAST(b.n AS DOUBLE)), 6) AS r
    FROM d a JOIN d b
      ON b.day = a.day AND a.event_type < b.event_type
    GROUP BY 1, 2
    """


@query("q_type_correlation", oracle=_TYPE_CORR_ORACLE)
def q_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of daily volumes for every event-type pair —
    "do errors spike with clicks?", the co-movement screen run before
    any causal story. The corpus reduces to the |types|×|days| panel
    FIRST (partial-aggregated); the pairwise self-join and corr run on
    that tiny frame, so the pair explosion never touches event rows
    (the q_level_shift posture, pairwise edition).
    """
    d = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    a = d.select(
        "day", F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    b = d.select(
        "day", F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_days"),
            F.round(
                F.corr(F.col("na").cast("double"), F.col("nb").cast("double")),
                6,
            ).alias("r"),
        )
    )


_SNAIVE_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, day, n,
             lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
      FROM d
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           round(avg(abs(n - pred) * 1.0 / n), 6) AS mape,
           round(avg((n - pred) * 1.0 / n), 6) AS bias
    FROM scored WHERE pred IS NOT NULL
    GROUP BY 1
    """


@query("q_seasonal_naive", oracle=_SNAIVE_ORACLE)
def q_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-type
    count with the value 7 days earlier (the baseline every real
    forecaster must beat) and report MAPE + signed bias per type.
    A lag over the |types|×|days| daily panel — the forecast, the
    backtest join, and the scoring are one window plus one aggregate
    on an already-tiny frame.
    """
    from pyspark.sql import Window

    d = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = d.withColumn("pred", F.lag("n", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_days_scored"),
        F.round(F.avg(F.abs(F.col("n") - F.col("pred")) / F.col("n")), 6).alias(
            "mape"
        ),
        F.round(F.avg((F.col("n") - F.col("pred")) / F.col("n")), 6).alias(
            "bias"
        ),
    )
