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


PSI_SPLIT = "2024-01-16"  # reference = days before, current = days from
PSI_BINS = 10


_PSI_ORACLE = f"""
    WITH e AS (
      SELECT event_type, value,
             CAST(ts AS DATE) < DATE '{PSI_SPLIT}' AS is_ref
      FROM events
    ),
    edges_l AS (
      SELECT event_type,
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS qs
      FROM e WHERE is_ref GROUP BY 1
    ),
    edges AS (
      SELECT event_type, unnest(qs) AS edge FROM edges_l
    ),
    binned AS (
      SELECT e.event_type, e.is_ref,
             1 + sum(CASE WHEN e.value > x.edge THEN 1 ELSE 0 END) AS bin
      FROM (SELECT row_number() OVER () AS rid, * FROM e) e
      JOIN edges x ON x.event_type = e.event_type
      GROUP BY e.rid, e.event_type, e.is_ref
    ),
    grid AS (
      SELECT DISTINCT b.event_type, g.bin
      FROM binned b, (SELECT unnest(generate_series(1, {PSI_BINS})) AS bin) g
    ),
    counts AS (
      SELECT g.event_type, g.bin,
             coalesce(sum(CASE WHEN NOT b.is_ref THEN 1 END), 0) AS nc,
             coalesce(sum(CASE WHEN b.is_ref THEN 1 END), 0) AS nr
      FROM grid g
      LEFT JOIN binned b
        ON b.event_type = g.event_type AND b.bin = g.bin
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(nc) AS tc, sum(nr) AS tr FROM counts GROUP BY 1
    )
    SELECT c.event_type,
           CAST(t.tr AS BIGINT) AS n_ref,
           CAST(t.tc AS BIGINT) AS n_cur,
           round(sum(
             ((c.nc + 0.5) / (t.tc + 5.0) - (c.nr + 0.5) / (t.tr + 5.0))
             * ln(((c.nc + 0.5) / (t.tc + 5.0))
                  / ((c.nr + 0.5) / (t.tr + 5.0)))
           ), 6) AS psi
    FROM counts c JOIN tot t ON t.event_type = c.event_type
    GROUP BY 1, 2, 3
    """


@query("q_psi_drift", oracle=_PSI_ORACLE)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the per-type value distribution:
    reference window (before {PSI_SPLIT}) vs current — THE production
    drift gate for model inputs (rule of thumb: psi < 0.1 stable,
    > 0.25 investigate). Decile edges are fit on the REFERENCE only
    (exact interpolated percentiles, the verified percentile ≡
    quantile_cont pairing), both halves are binned by those edges, and
    PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) with add-½ smoothing so an
    empty bin contributes finitely and identically in both engines.

    Scale: the 9 edges per type are a tiny broadcast frame; binning is
    a 9-comparison in-plan fold over one scan (sum of indicators, no
    per-row UDF); everything after is |types|×10 rows.
    """
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.to_date("ts") < F.lit(PSI_SPLIT).cast("date")).alias("is_ref"),
    )
    ks = list(range(1, PSI_BINS))
    edges = (
        e.filter("is_ref")
        .groupBy("event_type")
        .agg(
            F.array(
                *[F.percentile("value", F.lit(k / 10.0)) for k in ks]
            ).alias("edges")
        )
    )
    binned = (
        e.join(F.broadcast(edges), "event_type")
        .select(
            "event_type",
            "is_ref",
            (
                F.lit(1)
                + F.size(
                    F.filter(
                        "edges", lambda edge: F.col("value") > edge
                    )
                )
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("nc"),
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("nr"),
        )
        # |types|×10 rows consumed by the bin grid AND the left join —
        # checkpoint so the events scan + percentile-edge build runs
        # once (r14 plan audit: 16 scans without it; guide §2.4)
        .localCheckpoint(eager=False)
    )
    grid = (
        binned.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                table(spark, sf_dir, "events")
                .sparkSession.range(1, PSI_BINS + 1)
                .select(F.col("id").cast("bigint").alias("bin"))
            )
        )
    )
    counts = (
        grid.join(binned, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("nc", F.lit(0)).alias("nc"),
            F.coalesce("nr", F.lit(0)).alias("nr"),
        )
    )
    # counts feeds the per-type totals AND the final PSI aggregate;
    # the lazy checkpoint keeps the grid join single-execution too
    counts = counts.localCheckpoint(eager=False)
    tot = counts.groupBy("event_type").agg(
        F.sum("nc").alias("tc"), F.sum("nr").alias("tr")
    )
    pc = (F.col("nc") + 0.5) / (F.col("tc") + 5.0)
    pr = (F.col("nr") + 0.5) / (F.col("tr") + 5.0)
    return (
        counts.join(F.broadcast(tot), "event_type")
        .groupBy(
            "event_type",
            F.col("tr").cast("bigint").alias("n_ref"),
            F.col("tc").cast("bigint").alias("n_cur"),
        )
        .agg(F.round(F.sum((pc - pr) * F.log(pc / pr)), 6).alias("psi"))
        .select("event_type", "n_ref", "n_cur", "psi")
    )


_FANO_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(CAST(n AS DOUBLE)), 4) AS mean_daily,
           round(var_pop(CAST(n AS DOUBLE)), 4) AS var_daily,
           round(var_pop(CAST(n AS DOUBLE)) / avg(CAST(n AS DOUBLE)), 6)
             AS fano
    FROM d GROUP BY 1
    """


@query("q_burstiness", oracle=_FANO_ORACLE)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor) of daily volumes per event
    type: var/mean of the daily-count series — 1 for a Poisson arrival
    process, > 1 overdispersed (bursty), < 1 regular. One number that
    says whether q_burst_detection has anything to find, and the
    statistic capacity planners size queues by.

    Scale: the q_level_shift posture — one partial-aggregated daily
    panel, then a |types|-group moment aggregate over it.
    """
    d = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    nd = F.col("n").cast("double")
    return d.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg(nd), 4).alias("mean_daily"),
        F.round(F.var_pop(nd), 4).alias("var_daily"),
        F.round(F.var_pop(nd) / F.avg(nd), 6).alias("fano"),
    )


_ACF_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([1, 7]) AS lag_d)
    SELECT a.event_type,
           CAST(l.lag_d AS INT) AS lag_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(CAST(a.n AS DOUBLE), CAST(b.n AS DOUBLE)), 6)
             AS acf
    FROM d a
    CROSS JOIN lags l
    JOIN d b ON b.event_type = a.event_type
            AND b.day = a.day + l.lag_d
    GROUP BY 1, 2
    """


@query("q_autocorrelation", oracle=_ACF_ORACLE)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily volume series at lags 1 and 7 days
    per event type — the two numbers that justify (or kill) the
    seasonal-naive baseline: high ACF(7) says "use last week", high
    ACF(1) says "use yesterday", neither says "model harder".
    Computed as Pearson corr of the panel joined to itself at a day
    offset (the standard sample-ACF estimator on aligned pairs).

    Scale: the q_level_shift posture again — the corpus reduces to the
    |types|×|days| panel before the lag self-join, which is panel-
    sized × 2 lags.
    """
    d = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    lags = table(spark, sf_dir, "events").sparkSession.createDataFrame(
        [(1,), (7,)], "lag_d int"
    )
    # distinct column names per side: a bare self-join on event_type
    # would lean on the analyzer's self-join disambiguation (and warn
    # "trivially true equals predicate") — rename instead
    a = d.select("event_type", "day", F.col("n").alias("na"))
    b = d.select(
        F.col("event_type").alias("btype"),
        F.col("day").alias("bday"),
        F.col("n").alias("nb"),
    )
    return (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("event_type") == F.col("btype"))
            & (F.col("bday") == F.date_add("day", F.col("lag_d"))),
        )
        .groupBy("event_type", F.col("lag_d").cast("int").alias("lag_days"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.corr(
                    F.col("na").cast("double"), F.col("nb").cast("double")
                ),
                6,
            ).alias("acf"),
        )
    )


_XMR_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    mr AS (
      SELECT event_type, day, n,
             abs(n - lag(n) OVER (PARTITION BY event_type ORDER BY day))
               AS moving_range
      FROM d
    ),
    lim AS (
      SELECT event_type,
             avg(CAST(n AS DOUBLE)) AS xbar,
             avg(CAST(moving_range AS DOUBLE)) AS mrbar
      FROM mr GROUP BY 1
    )
    SELECT mr.event_type, mr.day,
           CAST(mr.n AS BIGINT) AS n,
           round(lim.xbar + 2.66 * lim.mrbar, 4) AS ucl,
           round(lim.xbar - 2.66 * lim.mrbar, 4) AS lcl,
           mr.n > lim.xbar + 2.66 * lim.mrbar
             OR mr.n < lim.xbar - 2.66 * lim.mrbar AS out_of_control
    FROM mr JOIN lim ON lim.event_type = mr.event_type
    """


@query("q_control_chart", oracle=_XMR_ORACLE)
def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals/moving-range) control chart over daily volumes:
    limits x̄ ± 2.66·MR̄ (the SPC constant for n=2 subgroups), each day
    flagged in/out of control — Shewhart's common-vs-special-cause
    split, the third anomaly lens next to q_burst_detection's global z
    and q_level_shift's windowed means (XmR limits come from
    POINT-TO-POINT variation, so a slow trend inflates z's baseline
    sd but not MR̄).

    Scale: the q_level_shift posture — daily panel first, one per-type
    lag, limits are a broadcast |types|-row frame. The flag compares
    UNROUNDED limits in both engines (rounding only the emitted
    columns), so boundary days classify identically.
    """
    from pyspark.sql import Window

    d = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    mr = d.withColumn(
        "moving_range", F.abs(F.col("n") - F.lag("n").over(w))
    )
    lim = mr.groupBy("event_type").agg(
        F.avg(F.col("n").cast("double")).alias("xbar"),
        F.avg(F.col("moving_range").cast("double")).alias("mrbar"),
    )
    ucl = F.col("xbar") + 2.66 * F.col("mrbar")
    lcl = F.col("xbar") - 2.66 * F.col("mrbar")
    return mr.join(F.broadcast(lim), "event_type").select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.round(ucl, 4).alias("ucl"),
        F.round(lcl, 4).alias("lcl"),
        ((F.col("n") > ucl) | (F.col("n") < lcl)).alias("out_of_control"),
    )


_LEADLAG_ORACLE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag_d)
    SELECT l.lag_d AS lag_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(CAST(a.n AS DOUBLE), CAST(b.n AS DOUBLE)), 6)
             AS xcorr
    FROM d a
    CROSS JOIN lags l
    JOIN d b ON b.event_type = 'purchase'
            AND a.event_type = 'click'
            AND b.day = a.day + l.lag_d
    GROUP BY 1
    """


@query("q_lead_lag", oracle=_LEADLAG_ORACLE)
def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: corr of daily CLICK volume with
    daily PURCHASE volume shifted by −2…+2 days — the screen for
    "does click volume LEAD purchases?" (the peak lag is the
    conversion latency at the aggregate level; a peak at 0 with decay
    is same-day conversion, matching q_interarrival's micro view).
    The cross-series generalization of q_autocorrelation.

    Scale: the same daily-panel posture; 5 lags × panel-sized join.
    """
    d = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    lags = table(spark, sf_dir, "events").sparkSession.createDataFrame(
        [(-2,), (-1,), (0,), (1,), (2,)], "lag_d int"
    )
    a = d.filter(F.col("event_type") == "click").select(
        "day", F.col("n").alias("na")
    )
    b = d.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("bday"), F.col("n").alias("nb")
    )
    return (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bday") == F.date_add("day", F.col("lag_d")))
        .groupBy(F.col("lag_d").alias("lag_days"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.corr(
                    F.col("na").cast("double"), F.col("nb").cast("double")
                ),
                6,
            ).alias("xcorr"),
        )
    )


_MIX_TREND_ORACLE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT day, sum(n) AS t FROM d GROUP BY 1),
    shares AS (
      SELECT d.event_type,
             CAST(date_diff('day', DATE '2024-01-01', d.day) AS DOUBLE)
               AS x,
             d.n * 1.0 / tot.t AS share
      FROM d JOIN tot ON tot.day = d.day
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(share), 6) AS mean_share,
           round(regr_slope(share, x) * 1000, 6)
             AS share_trend_per_1000d,
           round(regr_r2(share, x), 6) AS r2
    FROM shares GROUP BY 1
    """


@query("q_mix_trend", oracle=_MIX_TREND_ORACLE)
def q_mix_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift as REGRESSION SLOPES: each type's daily share of
    total volume regressed on the day index — a share trending up is a
    product-surface shift long before any distribution test fires
    (q_psi_drift tells you THAT the mix moved; this tells you which
    component, which direction, how fast). Slope reported per 1000
    days so the fixture's 30-day window prints readable numbers.

    Scale: daily mix panel (partial-aggregated), one closed-form
    regr_* aggregate per type (the regress.py posture).
    """
    e = table(spark, sf_dir, "events")
    d = (
        e.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = d.groupBy("day").agg(F.sum("n").alias("t"))
    shares = d.join(F.broadcast(tot), "day").select(
        "event_type",
        F.datediff("day", F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("x"),
        (F.col("n") / F.col("t")).alias("share"),
    )
    return shares.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("share"), 6).alias("mean_share"),
        F.round(F.regr_slope("share", "x") * 1000, 6).alias(
            "share_trend_per_1000d"
        ),
        F.round(F.regr_r2("share", "x"), 6).alias("r2"),
    )
