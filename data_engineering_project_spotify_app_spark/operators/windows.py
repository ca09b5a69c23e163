"""Window / time-series operators (SURVEY.md §2.5, §2.9 batch twins).

The reference has no explicit window functions, but two window-shaped
semantics are implicit (stable pagination → q_page_slice in core.py;
"top item per group by popularity" — the question its landed schema
exists to answer). These plus the streaming batch-twins live here.

Scale notes: every window below is partitioned (per-customer, per-user)
— state is bounded per key and the shuffle is a single hash exchange on
the partition key. No unpartitioned ORDER BY windows outside the
explicitly-global pagination operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: top-k per group — "top tracks per artist by popularity"
    (popularity columns: artists_schema.json:4, tracks_schema.json:13).

    row_number with a deterministic tie-break; Spark lowers the k-filter
    into a per-partition top-k (WindowGroupLimit) before the shuffle.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rnk",
        )
    )


@query(
    "q_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: per-customer running spend (SURVEY §2.5)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "q_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ), 2) AS delta
    FROM events
    """,
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead surface: per-user value delta between consecutive events."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "q_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 batch twin: tumbling-window aggregation over the event stream.

    Identical transformation lifts to readStream + withWatermark
    (streaming/stream_ops.py); here it runs batch so DuckDB can oracle it.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "q_sessionize",
    oracle="""
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
      )
    )
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions via lag + running sum.

    The classic composition (lag → new-session flag → cumulative sum as
    session id → per-session aggregate). In streaming this is
    session_window(ts, '30 minutes') — see streaming/stream_ops.py.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs precision: second-truncation would misclassify gaps within 1s of
    # the threshold vs the oracle's exact interval comparison
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH shifted AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               - k.k * INTERVAL '5 minutes' AS window_start
      FROM events
      CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
    )
    SELECT window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM shifted
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 batch twin: sliding windows (10-min length, 5-min slide).

    Every event lands in exactly length/slide = 2 overlapping windows;
    Spark's window() generates them natively, the oracle replays the
    expansion with an explicit 2-way bucket shift. Streaming lift:
    the same F.window(ts, "10 minutes", "5 minutes") under a watermark.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


DEBOUNCE_SECONDS = 60


@query(
    "q_debounce",
    oracle=f"""
    SELECT user_id, event_type,
           count(*) AS n_raw,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           CAST(sum(1 - keep) AS BIGINT) AS n_collapsed
    FROM (
      SELECT user_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w
                          > INTERVAL '{DEBOUNCE_SECONDS} seconds'
                  THEN 1 ELSE 0 END AS keep
      FROM (SELECT user_id, event_type, event_id,
                   CAST(ts AS TIMESTAMP) AS ts FROM events)
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    GROUP BY user_id, event_type
    """,
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / click-spam collapse: an event closer than 60s to the
    PREVIOUS event of the same (user, type) is collapsed into it — the
    standard rapid-duplicate filter for interaction logs (repeated
    clicks, double-submits) before funnel/retention analysis. Reports
    raw/kept/collapsed counts per (user, type).

    Predecessor-gap semantics (each event compares to its immediate
    predecessor), which is one lag window — the keep-only-after-last-
    KEPT variant is a sequential fold (not SQL-expressible without
    recursion) and belongs on the streaming path as stateful logic.

    Scale: one shuffle on (user_id, event_type); window partitions are
    bounded by per-user-per-type volume. µs-precision gap comparison
    (see q_sessionize's truncation note).
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    keep = (
        F.when(gap.isNull() | (gap > DEBOUNCE_SECONDS * 1_000_000), 1)
        .otherwise(0)
    )
    return (
        e.select("user_id", "event_type", keep.alias("keep"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_raw"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            F.sum(1 - F.col("keep")).cast("bigint").alias("n_collapsed"),
        )
    )


@query(
    "q_resample_ffill",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
      FROM events
    ),
    daily AS (
      SELECT user_id, day, round(sum(value), 4) AS v
      FROM e GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.day, d.v
      FROM grid g LEFT JOIN daily d
        ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id, day,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill,
           (v IS NULL) AS is_gap
    FROM j
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample + gap-fill: one row per (user, day)
    over each user's active span — daily value totals where events
    exist, forward-filled from the last observed day where they don't,
    with the gap flagged. The regularization step every downstream
    window/forecast/cohort computation assumes (windows over irregular
    event times silently skip missing days; models need the explicit
    grid).

    Spark has no native resample; the composition is sequence() over
    the per-user [min_day, max_day] span exploded to a calendar grid,
    LEFT join back, then last(ignorenulls) over a per-user ordered
    window — each stage a built-in, all codegen.

    Scale: the grid is span-bounded (days-per-user rows, not a global
    calendar cross join); daily agg, grid join, and the ffill window
    all key on user_id, and the window is per-user ordered by day —
    no global sort. Daily totals are rounded BEFORE the fill so both
    engines forward-fill identical values.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"), "value"
    )
    daily = e.groupBy("user_id", "day").agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


_ROLLING_MEDIAN_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 4) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, total,
           round(median(total) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM d
    """


@query("q_rolling_median", oracle=_ROLLING_MEDIAN_ORACLE)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily value totals per event
    type — the robust twin of the rolling means in q_sliding_window /
    q_trailing_30d (one outlier day drags a trailing mean for a week;
    the median shrugs it off, which is why ops dashboards plot both).

    Spark has no exact median window function; the engine collects the
    row frame into an array IN CODEGEN (collect_list over the 7-row
    frame), sorts it, and picks/averages the middle — exact, and legal
    precisely because the frame is 7 elements, not the partition. The
    daily totals are rounded BEFORE the median so both engines order
    identical doubles (the resample_ffill lesson); an even frame
    averages the two middle values, matching DuckDB's interpolating
    median.

    Scale: the daily pre-agg reduces to |types|×|days| rows before any
    window; the per-type ordered window runs over that tiny frame (the
    q_level_shift posture).
    """
    d = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("total"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    arr = F.sort_array(F.collect_list("total").over(w))
    n = F.size(arr)
    mid = F.floor((n + 1) / 2).cast("int")
    med = F.when(n % 2 == 1, F.element_at(arr, mid)).otherwise(
        (
            F.element_at(arr, mid)
            + F.element_at(arr, (mid + 1).cast("int"))
        )
        / 2.0
    )
    return d.select(
        "event_type", "day", "total", F.round(med, 4).alias("med7")
    )


_ACTIVE_USERS_ORACLE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM d GROUP BY 1),
    first_seen AS (SELECT user_id, min(day) AS day FROM d GROUP BY 1),
    new_u AS (SELECT day, count(*) AS new_users FROM first_seen GROUP BY 1)
    SELECT dau.day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(coalesce(new_u.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(new_u.new_users, 0)) OVER (
             ORDER BY dau.day ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS BIGINT) AS cumulative_users
    FROM dau LEFT JOIN new_u ON new_u.day = dau.day
    """


@query("q_active_users", oracle=_ACTIVE_USERS_ORACLE)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU / new-user / cumulative-distinct panel: per day, distinct
    active users, users seen for the FIRST time, and the running total
    of distinct users ever seen — cumulative count-distinct expressed
    scale-safely as "cumsum of first-seen days" (a running
    count(DISTINCT) window would re-scan the full user set per day).

    Scale: two hash aggs keyed by day and by user (both partial-
    aggregated); the only window runs over the |days|-sized panel.
    """
    d = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    dau = d.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    new_u = (
        d.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(new_u, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w))
    )


_ROLLING_DAU_ORACLE = """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    cover AS (
      SELECT DISTINCT d.day AS day, u.user_id
      FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    )
    SELECT day, CAST(count(*) AS BIGINT) AS dau7
    FROM cover GROUP BY 1
    """


@query("q_rolling_dau", oracle=_ROLLING_DAU_ORACLE)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day (WAU-style) — the
    windowed COUNT DISTINCT that has no partial-aggregatable window
    form. The scale idiom is COVER-WINDOW EXPLOSION: each (user,
    active-day) pair is exploded into the ≤7 report days whose trailing
    window it falls in, the (day, user) pairs are deduped, and a plain
    hash count per day finishes — a bounded 7× fan-out of the already
    user-day-deduped frame instead of a 7-way self-join of the panel or
    a per-day re-scan. Report days are restricted to OBSERVED days
    (semi-join with the day panel), so both engines emit the same grid.
    """
    e = table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    cover = (
        ud.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("day"),
            "user_id",
        )
        .join(days, "day", "left_semi")
        .distinct()
    )
    return cover.groupBy("day").agg(F.count("*").alias("dau7"))


_STICKINESS_ORACLE = """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
    days AS (SELECT DISTINCT day FROM ud),
    wau AS (
      SELECT d.day, count(DISTINCT u.user_id) AS wau
      FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY 1
    )
    SELECT dau.day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """


@query("q_stickiness", oracle=_STICKINESS_ORACLE)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement-frequency ratio every
    growth team tracks (1.0 = everyone active this week was active
    today; 1/7 ≈ each weekly user shows up once). Composes the daily
    distinct count with q_rolling_dau's cover-window trailing distinct;
    both sides reduce to (day, user) pairs before any counting.
    """
    e = table(spark, sf_dir, "events")
    # (day, user) pairs feed THREE consumers (dau, the day spine, and
    # the wau cover-window); unpinned, each re-ran the events scan +
    # distinct (before-plan: 12 exchanges). Narrow two-column frame —
    # pin it (guide §2.4).
    ud = (
        e.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    days = ud.select("day").distinct()
    wau = (
        ud.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("day"),
            "user_id",
        )
        .join(days, "day", "left_semi")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )
