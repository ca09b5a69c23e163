"""Event analytics over the ``events`` table: funnels and cohorts.

The canonical product-analytics question the landed event stream exists
to answer: how far does each user get through view → click → purchase,
and when? This is MATCH_RECOGNIZE-shaped logic that Spark SQL lacks as a
primitive; the engine expresses it as a *single-shuffle* fold — collect
each user's (ts, type) events into a sorted array and run the state
machine with the built-in ``aggregate`` higher-order function, entirely
inside codegen.

Scale: one groupBy(user_id) shuffle of (ts, type) pairs — the minimum
any per-user ordering can do; no window sort, no self-joins, no Python.
The per-user array must fit a task (events-per-user is bounded in any
real funnel window; at 100 TB you'd bound it with a date filter pushed
to the scan). The DuckDB oracle expresses the same semantics
relationally (stage-k time = min event time strictly after stage-k-1) —
two independent formulations, one answer.

Stage advance is strict (``ts > previous stage ts``): a click in the
same microsecond as the view does not advance, which makes the fold
order-independent under timestamp ties and keeps both engines exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

_STAGES = ("view", "click", "purchase")


_FUNNEL_ORACLE = """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    u AS (SELECT DISTINCT user_id FROM e),
    v AS (
      SELECT user_id, min(ts) AS tv FROM e
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1
    )
    SELECT u.user_id,
           CAST(CASE WHEN p.tp IS NOT NULL THEN 3
                     WHEN c.tc IS NOT NULL THEN 2
                     WHEN v.tv IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage,
           v.tv AS t_view, c.tc AS t_click, p.tp AS t_purchase
    FROM u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """


@query("q_funnel", oracle=_FUNNEL_ORACLE)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel state: deepest ordered stage reached + entry times.

    funnel_stage ∈ {0..3}: 0 = none of the funnel events in order,
    1 = viewed, 2 = clicked after viewing, 3 = purchased after clicking.
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_STAGES)
    )
    evs = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_type"))
        ).alias("evs")
    )

    acc0 = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("tv"),
        F.lit(None).cast("timestamp").alias("tc"),
        F.lit(None).cast("timestamp").alias("tp"),
    )

    def step(acc, x):
        adv_v = (acc["stage"] == 0) & (x["event_type"] == "view")
        adv_c = (
            (acc["stage"] == 1)
            & (x["event_type"] == "click")
            & (x["ts"] > acc["tv"])
        )
        adv_p = (
            (acc["stage"] == 2)
            & (x["event_type"] == "purchase")
            & (x["ts"] > acc["tc"])
        )
        return F.struct(
            F.when(adv_v, 1)
            .when(adv_c, 2)
            .when(adv_p, 3)
            .otherwise(acc["stage"])
            .alias("stage"),
            F.when(adv_v, x["ts"]).otherwise(acc["tv"]).alias("tv"),
            F.when(adv_c, x["ts"]).otherwise(acc["tc"]).alias("tc"),
            F.when(adv_p, x["ts"]).otherwise(acc["tp"]).alias("tp"),
        )

    folded = evs.select(
        "user_id", F.aggregate("evs", acc0, step).alias("f")
    )
    return folded.select(
        "user_id",
        F.col("f.stage").cast("bigint").alias("funnel_stage"),
        F.col("f.tv").alias("t_view"),
        F.col("f.tc").alias("t_click"),
        F.col("f.tp").alias("t_purchase"),
    )


_COHORT_ORACLE = """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    f AS (
      SELECT user_id, min(ts) AS t0 FROM e GROUP BY 1
    ),
    j AS (
      SELECT e.user_id,
             CAST(date_trunc('week', f.t0) AS DATE) AS cohort_week,
             CAST(date_trunc('week', e.ts) AS DATE) AS w
      FROM e JOIN f ON f.user_id = e.user_id
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, w) / 7 AS BIGINT)
             AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY 1, 2
    """


@query("q_cohort_retention", oracle=_COHORT_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-touch week,
    counted once per (cohort_week, weeks-since-cohort) they were active.

    The classic retention triangle. Both engines truncate weeks to
    Monday, so cells match exactly.

    Scale: first-touch is a map-side-combined min; the join back is on
    the same user_id key as the min's shuffle (co-partitioned, no second
    shuffle of the fact side under AQE); the retention grid itself is
    tiny (weeks × offsets). Distinct-user counting per cell is the only
    wide aggregation and it is keyed by the grid cell.
    """
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    j = e.join(first, "user_id").select(
        "user_id",
        F.to_date(F.date_trunc("week", "t0")).alias("cohort_week"),
        F.to_date(F.date_trunc("week", "ts")).alias("w"),
    )
    return (
        j.groupBy(
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             count(*) AS n
      FROM e WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, sum(n) AS total FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           round(t.n / CAST(tot.total AS DOUBLE), 4) AS p
    FROM t JOIN tot USING (from_type)
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered pair of event types, how often does `to` immediately follow
    `from` within one user's timeline, and what fraction of all
    transitions out of `from` is that (row-normalized probability,
    rounded to 4). The sequence-model view of the event stream — the
    aggregate q_funnel's state machine is a path through exactly this
    matrix.

    Scale: ONE shuffle on user_id for the lag window (ordering is
    (ts, event_id) — a strict total order, so both engines see the same
    predecessor under timestamp ties); the transition counts and row
    totals are tiny (|types|²) and the normalizing join broadcasts.
    """
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("total").cast("double"), 4).alias("p"),
    )


_DECAY_HALF_LIFE_DAYS = 7.0

_DECAYED_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value
      FROM events
    ),
    r AS (SELECT max(tus) AS ref FROM e)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value * exp((-(ln(2) / 7.0))
                     * ((r.ref - e.tus) / 86400000000.0))), 4)
             AS decayed_score
    FROM e, r
    GROUP BY user_id
    """


@query("q_decayed_engagement", oracle=_DECAYED_ORACLE)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed (exponential, 7-day half-life) per-user engagement:
    score_u = Σ value · 2^(-Δdays/7), Δ measured back from the corpus
    max timestamp. The recency-weighted activity feature a sampling
    policy wants instead of a raw count — a user active yesterday
    outweighs one equally active last quarter, with no arbitrary
    cutoff window.

    Engineering: computing the decay AT A FIXED REFERENCE TIME makes
    the weight per event independent of every other event, so the
    whole thing is one partial-aggregating groupBy — no window, no
    per-user ordering, no recursive EWMA state. (The online/recursive
    form lives in streaming.stateful.decayed_engagement_stream; at any
    event time the two agree after decaying the state to the ref.)

    Scale: the reference timestamp is a 1-row aggregate broadcast via
    crossJoin — corpus scanned twice (once for max, once to score);
    the score pass is a single hash shuffle on user_id with map-side
    partial aggregation. Both engines share exact integer µs arithmetic
    up to the final division, and the sum is rounded to 4dp (summation
    order differs cross-engine in the last ulp).
    """
    import math

    e = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tus"), "value"
    )
    ref = e.agg(F.max("tus").alias("ref"))
    lam = -(math.log(2.0) / _DECAY_HALF_LIFE_DAYS)
    days = (F.col("ref") - F.col("tus")) / F.lit(86400000000.0)
    return (
        e.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value") * F.exp(F.lit(lam) * days)), 4
            ).alias("decayed_score"),
        )
    )


RFM_K = 5

_RFM_ORACLE = f"""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS recency,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY 1
    )
    SELECT custkey, frequency, monetary,
           CAST(ntile({RFM_K}) OVER (ORDER BY recency DESC, custkey)
                AS BIGINT) AS r_q,
           CAST(ntile({RFM_K}) OVER (ORDER BY frequency DESC, custkey)
                AS BIGINT) AS f_q,
           CAST(ntile({RFM_K}) OVER (ORDER BY monetary DESC, custkey)
                AS BIGINT) AS m_q
    FROM rfm
    """


@query("q_rfm_segments", oracle=_RFM_ORACLE)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency / frequency /
    monetary quintiles (1 = best), the classic marketing-analytics
    cut. Quintile 1 of all three = champions; r_q 5 = churned.

    Scale: the input to ranking is the per-customer AGGREGATE (three
    shuffle-free-after-one-hash-agg scalars per customer), and each
    quintile is the two-phase range-partition global rank
    (rankutil.py) + closed-form ntile arithmetic — three parallel
    rank passes over a customer-sized frame, never a single-partition
    window (the q_ntile discipline, x3). Monetary sums are rounded to
    2dp BEFORE ranking so both engines rank identical keys; every
    order key carries the custkey tie-break.

    Note: the rfm aggregate has FOUR consumers (three ranks + the
    final join) and Spark shares no subplans across consumers — the
    per-customer aggregate is lazily checkpointed so the orders
    scan+agg runs once (re-measured r14: 1.22 → 1.09 s min at sf0.1;
    the earlier note that 4x re-aggregation was cheaper predated the
    lazy-checkpoint form).
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        ntile_from_rank,
        two_phase_global_rank,
    )

    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("recency"),
        F.count("*").cast("bigint").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    ).localCheckpoint(eager=False)
    n_ranges = max(8, spark.sparkContext.defaultParallelism)

    def quintile(df: DataFrame, order_col: str, out: str) -> DataFrame:
        ranked = two_phase_global_rank(
            df.select("custkey", order_col),
            [F.col(order_col).desc(), F.col("custkey")],
            n_ranges,
        )
        return ranked.select(
            "custkey",
            ntile_from_rank(F.col("rn"), F.col("n"), RFM_K).alias(out),
        )

    out = (
        rfm.join(quintile(rfm, "recency", "r_q"), "custkey")
        .join(quintile(rfm, "frequency", "f_q"), "custkey")
        .join(quintile(rfm, "monetary", "m_q"), "custkey")
    )
    return out.select(
        "custkey", "frequency", "monetary", "r_q", "f_q", "m_q"
    )


BURST_Z = 2.0

_BURST_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, avg(n_events) AS mu, stddev_pop(n_events) AS sd
      FROM daily GROUP BY 1
    )
    SELECT daily.event_type, daily.day, daily.n_events,
           round(CASE WHEN stats.sd = 0 THEN 0.0
                      ELSE (daily.n_events - stats.mu) / stats.sd END, 4)
             AS z,
           (round(CASE WHEN stats.sd = 0 THEN 0.0
                       ELSE (daily.n_events - stats.mu) / stats.sd END, 4)
            >= {BURST_Z}) AS is_burst
    FROM daily JOIN stats USING (event_type)
    """


@query("q_burst_detection", oracle=_BURST_ORACLE)
def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst screen: each (event_type, day) bucket's count as a
    z-score against that type's own daily distribution; z >= {BURST_Z}
    flags a burst (bot traffic, incident, crawl). Per-type baselining
    matters — a rare type's normal day would be a common type's
    anomaly.

    Scale: two hash aggregations (daily counts, then per-type
    mean/stddev over the DAILY frame — one row per type-day, not per
    event) and a broadcast of the O(types) stat frame back onto the
    daily frame. The burst flag compares the ROUNDED z in both engines
    so the boundary can't straddle a cross-engine ulp.
    """
    e = table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    daily = e.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_events")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n_events").alias("mu"),
        F.stddev_pop("n_events").alias("sd"),
    )
    z = F.round(
        F.when(F.col("sd") == 0, F.lit(0.0)).otherwise(
            (F.col("n_events") - F.col("mu")) / F.col("sd")
        ),
        4,
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .select(
            "event_type",
            "day",
            "n_events",
            "z",
            (F.col("z") >= BURST_Z).alias("is_burst"),
        )
    )


_AB_ORACLE = """
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST(instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) % 2 AS variant
      FROM events
    ),
    conv AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY 1 HAVING count(*) >= 14
    ),
    per AS (
      SELECT a.variant,
             CAST(count(*) AS DOUBLE) AS n_users,
             CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) AS n_conv
      FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
      GROUP BY 1
    ),
    wide AS (
      SELECT
        max(CASE WHEN variant = 0 THEN n_users END) AS n_a,
        max(CASE WHEN variant = 0 THEN n_conv END) AS c_a,
        max(CASE WHEN variant = 1 THEN n_users END) AS n_b,
        max(CASE WHEN variant = 1 THEN n_conv END) AS c_b
      FROM per
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(c_a / n_a, 4) AS rate_a,
           round(c_b / n_b, 4) AS rate_b,
           round(c_b / n_b - c_a / n_a, 4) AS lift,
           round(CASE WHEN (c_a + c_b) = 0 OR (c_a + c_b) = (n_a + n_b)
                      THEN 0.0
                      ELSE (c_b / n_b - c_a / n_a)
                           / sqrt(((c_a + c_b) / (n_a + n_b))
                                  * (1 - (c_a + c_b) / (n_a + n_b))
                                  * (1 / n_a + 1 / n_b)) END, 4) AS z_stat
    FROM wide
    """


@query("q_ab_test", oracle=_AB_ORACLE)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-assigned to two variants
    (first md5 hex digit of user_id, mod 2 — the same content-hash
    assignment discipline as q_dataset_split: stable across reruns,
    engines, and arrival order, never rand()), conversion = any
    'purchase' event; reports per-variant rates, absolute lift, and
    the pooled two-proportion z statistic — the number an experiment
    platform thresholds (|z| >= 1.96 for 95%) before shipping a
    variant.

    Scale: assignment and conversion are DISTINCT-user frames (hash
    aggregations on user_id), the per-variant rollup is 2 rows, and
    the z arithmetic is a 1-row projection. Nothing is event-count
    sized after the first aggregation.
    """
    ev = table(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.expr(
            "CAST(instr('0123456789abcdef', "
            "substring(md5(CAST(user_id AS STRING)), 1, 1)) - 1 "
            "AS BIGINT) % 2"
        ).alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("np"))
        .filter(F.col("np") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    per = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").cast("double").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("double")
            .alias("n_conv"),
        )
    )
    wide = per.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("c_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("c_b"),
    )
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(p_a, 4).alias("rate_a"),
        F.round(p_b, 4).alias("rate_b"),
        F.round(p_b - p_a, 4).alias("lift"),
        F.round(
            F.when((pool == 0) | (pool == 1), F.lit(0.0)).otherwise(
                (p_b - p_a)
                / F.sqrt(
                    pool
                    * (1 - pool)
                    * (1 / F.col("n_a") + 1 / F.col("n_b"))
                )
            ),
            4,
        ).alias("z_stat"),
    )


_PARETO_ORACLE = """
    WITH per AS (
      SELECT user_id, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT x,
             CAST(row_number() OVER (ORDER BY x, user_id) AS DOUBLE) AS rn,
             CAST(ntile(10) OVER (ORDER BY x DESC, user_id) AS BIGINT)
               AS decile
      FROM per
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(2 * sum(rn * x) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 4) AS gini,
           round(sum(CASE WHEN decile = 1 THEN x ELSE 0 END) / sum(x), 4)
             AS top_decile_share
    FROM ranked
    """


@query("q_pareto_report", oracle=_PARETO_ORACLE)
def q_pareto_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-concentration audit: Gini coefficient of events-per-user
    plus the top-decile share — the one-row answer to "is this metric
    driven by a handful of power users?" (Gini 0 = uniform usage,
    near 1 = monopoly; the 80/20 rule is top_decile_share ~ 0.8 at
    decile granularity). The same inequality lens applies to tokens
    per source or shard sizes — swap the key.

    Scale: the corpus collapses to one row per user first; both the
    ascending rank (Gini sum) and the descending ntile (decile cut)
    are two-phase range-partition global ranks over that USER-SIZED
    aggregate — two cheap passes rather than deriving one order from
    the other, because the reversed tie-break of equal-x runs would
    shift which ties sit on a decile boundary (see inline comment).
    The final report is a 1-row aggregate.
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        ntile_from_rank,
        two_phase_global_rank,
    )

    per = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("double").alias("x"))
        # consumed by BOTH two-phase rank passes (asc Gini rank, desc
        # decile rank): checkpoint so the events scan+agg runs once
        .localCheckpoint(eager=False)
    )
    ranked = two_phase_global_rank(
        per,
        [F.col("x"), F.col("user_id")],
        max(8, spark.sparkContext.defaultParallelism),
    )
    # descending rank = n - rn + 1; ntile(10) of the DESC order needs
    # the DESC ordering's tie-break to be (x DESC, user_id ASC) — our
    # ascending total order is (x ASC, user_id ASC), whose reverse is
    # (x DESC, user_id DESC). Equal-x runs therefore reverse user_id
    # order between the two formulations, which changes WHICH ties sit
    # on a decile boundary. Rank the DESC order directly instead:
    # a second two-phase pass over the user-sized aggregate.
    desc_ranked = two_phase_global_rank(
        per.select(F.col("user_id").alias("uid_d"), F.col("x").alias("xd")),
        [F.col("xd").desc(), F.col("uid_d")],
        max(8, spark.sparkContext.defaultParallelism),
    ).select(
        "uid_d",
        ntile_from_rank(F.col("rn"), F.col("n"), 10).alias("decile"),
    )
    j = ranked.join(
        desc_ranked, F.col("user_id") == F.col("uid_d")
    ).select("x", F.col("rn").cast("double").alias("rna"), "decile")
    n = F.count("*")
    return j.agg(
        n.cast("bigint").alias("n_users"),
        F.round(
            2 * F.sum(F.col("rna") * F.col("x")) / (n * F.sum("x"))
            - (n + 1.0) / n,
            4,
        ).alias("gini"),
        F.round(
            F.sum(F.when(F.col("decile") == 1, F.col("x")).otherwise(0.0))
            / F.sum("x"),
            4,
        ).alias("top_decile_share"),
    )


_ATTRIBUTION_ORACLE = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type, value FROM events
    ),
    attributed AS (
      SELECT user_id, ts, event_type, value,
             coalesce(
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'direct') AS touch
      FROM e
    )
    SELECT touch AS attributed_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS total_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY 1
    """


@query("q_attribution", oracle=_ATTRIBUTION_ORACLE)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the most recent
    preceding non-purchase event of the same user ('direct' if none).

    One window over (user_id; ts, event_id) — a single shuffle keyed by
    user, the minimum for any per-user ordering. ``last(..., ignorenulls)``
    over the 1-preceding frame picks the latest non-purchase touch, so a
    purchase train after one click all credits that click. The frame is
    ROW-based with event_id as the tie-break, making same-microsecond
    ordering identical in both engines.

    Scale: partition key is user_id (naturally high-cardinality, no
    skew); at 100 TB you'd bound the lookback with a range frame or a
    date filter pushed to the scan.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.coalesce(
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
        F.lit("direct"),
    )
    return (
        e.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("touch").alias("attributed_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


_SEASONALITY_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(strftime(ts, '%w') AS INT) AS dow,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, sum(n) AS total FROM d GROUP BY 1
    )
    SELECT d.event_type,
           CAST(t.total AS BIGINT) AS n_events,
           round(sum((d.n - t.total / 7.0) * (d.n - t.total / 7.0))
                 / (t.total / 7.0), 4) AS chi2,
           CAST(min(CASE WHEN d.n = m.mx THEN d.dow END) AS INT) AS peak_dow
    FROM d
    JOIN t ON t.event_type = d.event_type
    JOIN (SELECT event_type, max(n) AS mx FROM d GROUP BY 1) m
      ON m.event_type = d.event_type
    GROUP BY d.event_type, t.total
    """


@query("q_seasonality", oracle=_SEASONALITY_ORACLE)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: chi-square vs uniform.

    chi2 = Σ_dow (obs - exp)² / exp with exp = total/7 — the standard
    goodness-of-fit screen for "is this event type day-patterned?".
    peak_dow is the modal day (0=Sunday; min dow on ties). Missing days
    contribute 0 observed — both engines aggregate only observed days,
    so the absent-day term (exp²/exp = exp) is intentionally excluded
    from BOTH sides identically (the fixture covers all 7 days).

    Scale: two tiny hash aggs — (type, dow) has ≤ 7×|types| groups;
    everything after the first partial-aggregated shuffle is broadcast-
    sized. The 30-day fixture window means weekday counts are unequal
    by construction (5 of one weekday vs 4 of another), so chi2 > 0
    even for a perfectly uniform-rate process — the report answers
    relative patterning across types, which is invariant to that.
    """
    e = table(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; strftime('%w'): 0=Sunday.
    d = (
        e.select(
            "event_type", (F.dayofweek("ts") - F.lit(1)).alias("dow")
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("n"))
    )
    t = d.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.max("n").alias("mx")
    )
    exp = F.col("total") / F.lit(7.0)
    return (
        d.join(F.broadcast(t), "event_type")
        .groupBy("event_type", "total")
        .agg(
            F.round(
                F.sum((F.col("n") - exp) * (F.col("n") - exp)) / F.first(exp),
                4,
            ).alias("chi2"),
            F.min(
                F.when(F.col("n") == F.col("mx"), F.col("dow"))
            ).cast("int").alias("peak_dow"),
        )
        .select(
            "event_type",
            F.col("total").cast("bigint").alias("n_events"),
            "chi2",
            "peak_dow",
        )
    )


_LEVEL_SHIFT_ORACLE = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, n,
             avg(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS pre_mean,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS pre_n,
             avg(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
               AS post_mean,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
               AS post_n
      FROM d
    )
    SELECT event_type, day,
           CAST(n AS BIGINT) AS n_events,
           round(pre_mean, 4) AS pre_mean,
           round(post_mean, 4) AS post_mean,
           round(post_mean - pre_mean, 4) AS shift
    FROM w
    WHERE pre_n = 3 AND post_n = 3
    """


@query("q_level_shift", oracle=_LEVEL_SHIFT_ORACLE)
def q_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift (change-point) screen on the daily event-rate series:
    for every day with a full 3-day window on BOTH sides, the jump
    between the trailing-3-day mean (strictly before the day) and the
    3-day mean starting at the day. The complement to q_burst_detection:
    bursts catch one-day spikes vs a global baseline; this catches
    SUSTAINED rate changes (deploys, campaign starts) the spike z-score
    smears out. Row-count ROWS frames + the full-window predicate make
    both engines agree exactly at series edges.

    Scale: the daily pre-agg reduces the stream to |types|×|days| rows
    BEFORE the window shuffle, so the per-type ordered windows run over
    a tiny frame regardless of corpus size — the window partition key is
    event_type, acceptable precisely because of that pre-reduction.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    d = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("event_type").orderBy("day")
    pre = wp.rowsBetween(-3, -1)
    post = wp.rowsBetween(0, 2)
    return (
        d.select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("n_events"),
            F.avg("n").over(pre).alias("pre_raw"),
            F.count("*").over(pre).alias("pre_n"),
            F.avg("n").over(post).alias("post_raw"),
            F.count("*").over(post).alias("post_n"),
        )
        .filter((F.col("pre_n") == 3) & (F.col("post_n") == 3))
        .select(
            "event_type",
            "day",
            "n_events",
            F.round("pre_raw", 4).alias("pre_mean"),
            F.round("post_raw", 4).alias("post_mean"),
            # Rounded LAST from the raw means (round(a-b) != round(a)-round(b)).
            F.round(F.col("post_raw") - F.col("pre_raw"), 4).alias("shift"),
        )
    )


_TRIGRAM_PATHS_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM s WHERE t3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, t1, t2, t3
    LIMIT 20
    """


@query("q_trigram_paths", oracle=_TRIGRAM_PATHS_ORACLE)
def q_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 behavior paths: consecutive event-type triples
    within one user's (ts, event_id)-ordered timeline — the order-2
    extension of q_markov_transitions (same shuffle, two leads instead
    of one lag). Deterministic top-k tie-break on the path itself.

    Scale: one user-keyed window shuffle; the path counts are at most
    |types|³ rows and the global top-20 is a tiny final sort.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(20)
    )


_LTV_ORACLE = """
    WITH fs AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ),
    cohorts AS (
      SELECT user_id, date_trunc('week', d0) AS cohort_week, d0 FROM fs
    ),
    csize AS (
      SELECT cohort_week, count(*) AS cohort_users
      FROM cohorts GROUP BY 1
    ),
    rev AS (
      SELECT c.cohort_week,
             CAST(floor(date_diff('day', c.d0, CAST(e.ts AS DATE)) / 7)
                  AS INT) AS age_week,
             sum(e.value) AS week_value
      FROM events e
      JOIN cohorts c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT r.cohort_week,
           r.age_week,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           round(r.week_value, 4) AS week_value,
           round(sum(r.week_value) OVER (
                   PARTITION BY r.cohort_week ORDER BY r.age_week
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / s.cohort_users, 4) AS cum_ltv
    FROM rev r JOIN csize s ON s.cohort_week = r.cohort_week
    """


@query("q_cohort_ltv", oracle=_LTV_ORACLE)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: per signup-week cohort (first-seen week) and
    account-age week, the purchase value landed that week and the
    running cumulative value PER COHORT USER — the panel behind every
    "does LTV pay back CAC by week N" decision, and the revenue twin
    of q_cohort_retention's activity matrix.

    Scale: first-seen is one user-keyed hash agg; revenue lands on the
    (cohort_week × age_week) grid BEFORE any window, so the cumulative
    sum runs over a panel of at most |weeks|² rows. Age is measured
    from the user's OWN first day (not the cohort week start), so two
    users of one cohort age independently — the standard convention.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    cohorts = fs.select(
        "user_id", "d0", F.date_trunc("week", "d0").cast("date").alias(
            "cohort_week"
        )
    )
    csize = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("d0")) / 7
            ).cast("int").alias("age_week"),
        )
        .agg(F.sum("value").alias("week_value"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(F.broadcast(csize), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "cohort_users",
            F.round("week_value", 4).alias("week_value"),
            F.round(
                F.sum("week_value").over(w) / F.col("cohort_users"), 4
            ).alias("cum_ltv"),
        )
    )


_INTERARRIVAL_ORACLE = """
    WITH gaps AS (
      SELECT event_type,
             date_diff('microseconds',
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id),
                       ts) / 1e6 AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
           round(quantile_cont(gap_s, 0.99), 4) AS p99_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY 1
    """


@query("q_interarrival", oracle=_INTERARRIVAL_ORACLE)
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: p50/p90/p99 of
    the gap (seconds) between a user's consecutive events of one type —
    the latency-histogram view of user behavior (burst cadence, polling
    intervals, organic pacing) that mean-based rates hide.

    One window keyed by (user_id, event_type) — high-cardinality, no
    skew — then an exact interpolated percentile per type (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the q_robust_scale
    verified pairing; at 100 TB swap for approx_percentile, same plan).
    Gaps are computed in whole microseconds (both engines subtract at
    the timestamp's native precision) and divided to seconds, so the
    doubles agree exactly.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            )
            / 1e6
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 4).alias("p90_s"),
        F.round(F.percentile("gap_s", F.lit(0.99)), 4).alias("p99_s"),
    )


_NEW_RETURNING_ORACLE = """
    WITH fs AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ),
    p AS (
      SELECT CAST(e.ts AS DATE) AS day, e.user_id, e.value,
             CAST(e.ts AS DATE) = fs.d0 AS is_new
      FROM events e JOIN fs ON fs.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    )
    SELECT day,
           CAST(count(DISTINCT CASE WHEN is_new THEN user_id END)
                AS BIGINT) AS new_buyers,
           CAST(count(DISTINCT CASE WHEN NOT is_new THEN user_id END)
                AS BIGINT) AS returning_buyers,
           round(sum(CASE WHEN is_new THEN value ELSE 0 END), 4)
             AS new_revenue,
           round(sum(CASE WHEN NOT is_new THEN value ELSE 0 END), 4)
             AS returning_revenue
    FROM p GROUP BY 1
    """


@query("q_new_vs_returning", oracle=_NEW_RETURNING_ORACLE)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue split by buyer tenure: purchases on a user's very
    first active day are "new", everything later "returning" — the
    growth-accounting panel (is revenue acquisition- or
    retention-driven?) that pairs with q_active_users' volume view.

    Scale: first-seen is the same user-keyed min as q_active_users;
    the join back is co-partitioned on user_id under AQE; the daily
    split is one conditional aggregate over the |days| grid.
    """
    e = table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(fs, "user_id")
        .select(
            F.to_date("ts").alias("day"),
            "user_id",
            "value",
            (F.to_date("ts") == F.col("d0")).alias("is_new"),
        )
    )
    return p.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("is_new"), F.col("user_id"))
        ).alias("new_buyers"),
        F.countDistinct(
            F.when(~F.col("is_new"), F.col("user_id"))
        ).alias("returning_buyers"),
        F.round(
            F.sum(F.when(F.col("is_new"), F.col("value")).otherwise(0.0)), 4
        ).alias("new_revenue"),
        F.round(
            F.sum(F.when(~F.col("is_new"), F.col("value")).otherwise(0.0)), 4
        ).alias("returning_revenue"),
    )


ABANDON_WINDOW_MIN = 60


_ABANDON_ORACLE = f"""
    WITH w AS (
      SELECT user_id, event_id, ts, event_type,
             min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS next_purchase_ts
      FROM events
    )
    SELECT user_id, event_id, ts AS view_ts,
           next_purchase_ts IS NOT NULL AS purchased_later,
           coalesce(next_purchase_ts
                      <= ts + INTERVAL {ABANDON_WINDOW_MIN} MINUTE,
                    false) AS converted_1h
    FROM w
    WHERE event_type = 'view'
      AND (next_purchase_ts IS NULL
           OR next_purchase_ts > ts + INTERVAL {ABANDON_WINDOW_MIN} MINUTE)
    """


@query("q_abandoned_views", oracle=_ABANDON_ORACLE)
def q_abandoned_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abandonment: view events with NO purchase by the same user within
    the next {ABANDON_WINDOW_MIN} minutes — the time-bounded ANTI-join
    (q_interval_join's inner-match complement) behind every retargeting
    feed. One reverse-frame window per user computes the NEXT purchase
    timestamp (running conditional min over the following rows), so
    the bounded non-match test needs no join at all — the single
    user-keyed shuffle every per-user ordering pays, nothing more.
    Frame order carries the event_id tie-break; a purchase in the same
    microsecond as the view counts as converting (CURRENT ROW is in
    the frame) in both engines identically.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    next_p = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    bound = F.col("ts") + F.expr(
        f"INTERVAL {ABANDON_WINDOW_MIN} MINUTES"
    )
    return (
        e.withColumn("next_purchase_ts", next_p)
        .filter(
            (F.col("event_type") == "view")
            & (
                F.col("next_purchase_ts").isNull()
                | (F.col("next_purchase_ts") > bound)
            )
        )
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("view_ts"),
            F.col("next_purchase_ts").isNotNull().alias("purchased_later"),
            F.coalesce(
                F.col("next_purchase_ts") <= bound, F.lit(False)
            ).alias("converted_1h"),
        )
    )


_UPLIFT_ORACLE = """
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    sess AS (
      SELECT user_id, sid,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS clicked,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
      FROM s GROUP BY 1, 2
    ),
    g AS (
      SELECT clicked, count(*) AS n, sum(purchased) AS conv
      FROM sess GROUP BY 1
    )
    SELECT CAST(t.n AS BIGINT) AS n_click_sessions,
           CAST(c.n AS BIGINT) AS n_other_sessions,
           round(t.conv * 1.0 / t.n, 6) AS p_click,
           round(c.conv * 1.0 / c.n, 6) AS p_other,
           round(t.conv * 1.0 / t.n - c.conv * 1.0 / c.n, 6)
             AS uplift_abs,
           round((t.conv * 1.0 / t.n) / (c.conv * 1.0 / c.n), 6)
             AS relative_risk
    FROM g t JOIN g c ON t.clicked = 1 AND c.clicked = 0
    """


@query("q_uplift", oracle=_UPLIFT_ORACLE)
def q_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observational uplift at SESSION grain: purchase rate of sessions
    containing a click vs sessions without one — absolute uplift and
    relative risk, the two-by-two table behind "does the feature
    correlate with converting" (the OBSERVATIONAL cousin of
    q_ab_test's randomized readout; confounding is the caller's
    problem and the reason q_ab_test exists). Session grain, not user
    grain: over a 30-day window every fixture user has every event
    type, so user-level conditioning is degenerate (the revenue-bridge
    vacuous-pass lesson — group sizes checked: 7.5k vs 2.0k sessions
    at sf0.01).

    Scale: the 30-minute sessionization is q_sessionize's lag +
    running-sum composition (one user-keyed shuffle); session flags
    are conditional maxes inside the same aggregation, and everything
    after is a 2-row frame.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = (
        flagged.withColumn(
            "sid",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicked"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchased"),
        )
    )
    g = sess.groupBy("clicked").agg(
        F.count("*").alias("n"), F.sum("purchased").alias("conv")
    )
    t = g.filter(F.col("clicked") == 1).select(
        F.col("n").alias("nt"), F.col("conv").alias("ct")
    )
    c = g.filter(F.col("clicked") == 0).select(
        F.col("n").alias("nc"), F.col("conv").alias("cc")
    )
    return t.crossJoin(c).select(
        F.col("nt").alias("n_click_sessions"),
        F.col("nc").alias("n_other_sessions"),
        F.round(F.col("ct") / F.col("nt"), 6).alias("p_click"),
        F.round(F.col("cc") / F.col("nc"), 6).alias("p_other"),
        F.round(
            F.col("ct") / F.col("nt") - F.col("cc") / F.col("nc"), 6
        ).alias("uplift_abs"),
        F.round(
            (F.col("ct") / F.col("nt")) / (F.col("cc") / F.col("nc")), 6
        ).alias("relative_risk"),
    )


_TTC_ORACLE = """
    WITH f AS (
      SELECT user_id,
             min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT user_id, tp IS NOT NULL AS converted,
             CASE WHEN tp IS NOT NULL
                  THEN date_diff('microseconds', t0, tp) / 86400000000.0
             END AS days
      FROM f
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           round(sum(CASE WHEN converted THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS conversion_rate,
           round(quantile_cont(days, 0.5), 4) AS median_days,
           round(quantile_cont(days, 0.9), 4) AS p90_days
    FROM d
    """


@query("q_time_to_convert", oracle=_TTC_ORACLE)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event summary: days from a user's first touch to their
    first purchase — conversion rate plus the median/p90 of the
    conversion-lag distribution among converters (the survival-curve
    summary row; users who never purchase are the censored mass that
    the rate, not the quantiles, accounts for).

    Scale: one user-keyed conditional-min aggregate reduces the stream
    to a row per user; the exact interpolated percentiles run over
    that frame (percentile ≡ quantile_cont, the verified pairing —
    swap for approx_percentile at 100 TB, same plan). Lag computed in
    whole microseconds then divided, so doubles agree exactly.
    """
    e = table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
    )
    d = f.select(
        F.col("tp").isNotNull().alias("converted"),
        F.when(
            F.col("tp").isNotNull(),
            (F.unix_micros("tp") - F.unix_micros("t0")) / 86400000000.0,
        ).alias("days"),
    )
    return d.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias(
            "n_converted"
        ),
        F.round(
            F.sum(F.when(F.col("converted"), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("conversion_rate"),
        F.round(F.percentile("days", F.lit(0.5)), 4).alias("median_days"),
        F.round(F.percentile("days", F.lit(0.9)), 4).alias("p90_days"),
    )


_TOP_MOVERS_ORACLE = """
    WITH w AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('week', l.l_shipdate) AS DATE) AS week,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    d AS (
      SELECT brand, week, rev,
             lag(rev) OVER (PARTITION BY brand ORDER BY week) AS prev
      FROM w
    ),
    last_week AS (SELECT max(week) AS wk FROM d WHERE prev IS NOT NULL)
    SELECT brand,
           round(rev, 2) AS revenue,
           round(prev, 2) AS prev_revenue,
           round((rev - prev) / prev, 6) AS wow_change,
           CAST(row_number() OVER (
             ORDER BY abs((rev - prev) / prev) DESC, brand) AS BIGINT)
             AS rnk
    FROM d, last_week
    WHERE d.week = last_week.wk AND prev IS NOT NULL
    QUALIFY rnk <= 10
    """


@query("q_top_movers", oracle=_TOP_MOVERS_ORACLE)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending report: the 10 brands with the largest week-over-week
    relative revenue swing in the LATEST complete week — the "what
    changed" screen run after every weekly close (pairs with
    q_revenue_bridge, which explains WHY a mover moved).

    Scale: the fact reduces to the |brands|×|weeks| panel first
    (broadcast dim join, partial-aggregated); the lag window, the
    latest-week filter, and the global top-10 all run on that panel.
    Ranking on abs relative change with a brand tie-break.
    """
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("week", "l_shipdate")).alias("week"),
        )
        .agg(F.sum("net").alias("rev"))
    )
    lagw = Window.partitionBy("brand").orderBy("week")
    # The lagged panel feeds the latest-week scalar AND the ranked
    # report; unpinned, the lineitem scan + brand join + weekly
    # aggregate ran once per consumer. |brands|×|weeks|-sized — pin it
    # (guide §2.4).
    d = (
        w.withColumn("prev", F.lag("rev").over(lagw))
        .filter(F.col("prev").isNotNull())
        .localCheckpoint(eager=False)
    )
    last_week = d.agg(F.max("week").alias("wk"))
    chg = (F.col("rev") - F.col("prev")) / F.col("prev")
    ranked = (
        d.join(F.broadcast(last_week), d.week == F.col("wk"))
        .withColumn(
            # rank(), not row_number(): the (|chg|, brand) order is total,
            # so they agree — and only rank gets the WindowGroupLimit
            # map-side prune (brand-bounded input today, but free safety)
            "rnk",
            F.rank()
            .over(Window.orderBy(F.abs(chg).desc(), "brand"))
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= 10)
    )
    return ranked.select(
        "brand",
        F.round("rev", 2).alias("revenue"),
        F.round("prev", 2).alias("prev_revenue"),
        F.round(chg, 6).alias("wow_change"),
        "rnk",
    )


_VELOCITY_ORACLE = f"""
    WITH funnel AS ({_FUNNEL_ORACLE.replace(chr(10) + '    ', chr(10))}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN funnel_stage >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked,
           CAST(sum(CASE WHEN funnel_stage >= 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchased,
           round(quantile_cont(
             date_diff('microseconds', t_view, t_click) / 3600000000.0,
             0.5), 4) AS median_view_to_click_h,
           round(quantile_cont(
             date_diff('microseconds', t_click, t_purchase) / 3600000000.0,
             0.5), 4) AS median_click_to_purchase_h
    FROM funnel
    """


@query("q_funnel_velocity", oracle=_VELOCITY_ORACLE)
def q_funnel_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel VELOCITY: how fast users move between ordered stages —
    stage-reach counts plus the median view→click and click→purchase
    lags (hours) over q_funnel's per-user state rows. The companion
    question to q_funnel's "how far" and q_time_to_convert's
    first-touch lag: a stage that converts well but slowly is a
    different product problem than one that loses users outright.

    Composes the registered fold (same single user-keyed shuffle);
    quantiles skip NULL stage timestamps in both engines identically
    (users who never reached the stage contribute to counts only).
    Lags in whole microseconds → hours, so doubles agree exactly.
    """
    f = q_funnel(spark, sf_dir)
    v2c = (
        F.unix_micros("t_click") - F.unix_micros("t_view")
    ) / 3600000000.0
    c2p = (
        F.unix_micros("t_purchase") - F.unix_micros("t_click")
    ) / 3600000000.0
    return f.agg(
        F.count("*").alias("n_users"),
        F.sum(
            F.when(F.col("funnel_stage") >= 2, 1).otherwise(0)
        ).alias("n_clicked"),
        F.sum(
            F.when(F.col("funnel_stage") >= 3, 1).otherwise(0)
        ).alias("n_purchased"),
        F.round(F.percentile(v2c, F.lit(0.5)), 4).alias(
            "median_view_to_click_h"
        ),
        F.round(F.percentile(c2p, F.lit(0.5)), 4).alias(
            "median_click_to_purchase_h"
        ),
    )


_HOUR_PROFILE_ORACLE = """
    WITH c AS (
      SELECT event_type,
             CAST(strftime(ts, '%w') AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hh,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    md AS (SELECT event_type, dow, sum(n) AS nd FROM c GROUP BY 1, 2),
    mh AS (SELECT event_type, hh, sum(n) AS nh FROM c GROUP BY 1, 2),
    tt AS (SELECT event_type, sum(n) AS t FROM c GROUP BY 1)
    SELECT c.event_type, c.dow, c.hh,
           CAST(c.n AS BIGINT) AS n,
           round(c.n * 1.0 * tt.t / (md.nd * mh.nh), 4) AS lift
    FROM c
    JOIN md ON md.event_type = c.event_type AND md.dow = c.dow
    JOIN mh ON mh.event_type = c.event_type AND mh.hh = c.hh
    JOIN tt ON tt.event_type = c.event_type
    """


@query("q_hour_profile", oracle=_HOUR_PROFILE_ORACLE)
def q_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity grid per event type, with the
    INDEPENDENCE LIFT per cell: n·T/(n_dow·n_hour) — 1.0 where the
    weekly and daily rhythms explain the cell, >1 where a specific
    (day, hour) genuinely concentrates activity beyond both marginals
    (the 2-D extension of q_seasonality's day-only χ², and the same
    observed-vs-independence shape as q_source_lang_mi).

    Scale: one partial-aggregated pass to the ≤ types×7×24 grid;
    marginals are broadcast-sized re-aggregations of it.
    """
    # The ≤ types×7×24 grid feeds THREE marginal re-aggregations plus
    # the final join; unpinned, each consumer re-ran the full events
    # scan + groupBy (before-plan: 14 exchanges / 8 scans). Pin the
    # grid — one corpus pass instead of four (guide §2.4).
    c = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.dayofweek("ts") - F.lit(1)).alias("dow"),
            F.hour("ts").alias("hh"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    md = c.groupBy("event_type", "dow").agg(F.sum("n").alias("nd"))
    mh = c.groupBy("event_type", "hh").agg(F.sum("n").alias("nh"))
    tt = c.groupBy("event_type").agg(F.sum("n").alias("t"))
    return (
        c.join(F.broadcast(md), ["event_type", "dow"])
        .join(F.broadcast(mh), ["event_type", "hh"])
        .join(F.broadcast(tt), "event_type")
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("hh").cast("int").alias("hh"),
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.col("n") * F.col("t") / (F.col("nd") * F.col("nh")), 4
            ).alias("lift"),
        )
    )


LINEAR_ATTR_WINDOW_MIN = 60


_LINEAR_ATTR_ORACLE = f"""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.event_id AS purchase_id, e.event_type
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type <> 'purchase'
       AND e.ts < p.ts
       AND e.ts >= p.ts - INTERVAL {LINEAR_ATTR_WINDOW_MIN} MINUTE
    ),
    k AS (
      SELECT purchase_id, count(*) AS n_touches FROM touches GROUP BY 1
    )
    SELECT t.event_type AS touch_type,
           CAST(count(*) AS BIGINT) AS n_touch_events,
           round(sum(1.0 / k.n_touches), 4) AS credit
    FROM touches t JOIN k ON k.purchase_id = t.purchase_id
    GROUP BY 1
    """


@query("q_linear_attribution", oracle=_LINEAR_ATTR_ORACLE)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: every non-purchase touch in the
    {LINEAR_ATTR_WINDOW_MIN} minutes before a purchase shares the
    credit equally (1/k each) — the equal-weight companion to
    q_attribution's last-touch winner-takes-all; comparing the two
    tables is how attribution-model debates are actually run.

    ZERO joins on the Spark side: one per-user RANGE-frame window
    (rangeBetween on epoch-micros over the purchase's preceding hour)
    collects the touch types in-frame, and credit explodes as
    1/size(frame) — the banded-window form of the oracle's range
    self-join. Purchases with no in-window touch drop (credit has no
    'direct' bucket here; q_attribution covers that convention).
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-LINEAR_ATTR_WINDOW_MIN * 60 * 1_000_000, -1)
    )
    touches = F.collect_list(
        F.when(F.col("event_type") != "purchase", F.col("event_type"))
    ).over(w)
    per_purchase = (
        e.withColumn("touches", touches)
        .filter(
            (F.col("event_type") == "purchase") & (F.size("touches") > 0)
        )
        .select("event_id", "touches")
    )
    return (
        per_purchase.select(
            F.explode("touches").alias("touch_type"),
            (F.lit(1.0) / F.size("touches")).alias("w"),
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_touch_events"),
            F.round(F.sum("w"), 4).alias("credit"),
        )
    )


FUNNEL_WINDOW_H = 24


_WINDOWED_FUNNEL_ORACLE = f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    u AS (SELECT DISTINCT user_id FROM e),
    v AS (
      SELECT user_id, min(ts) AS tv FROM e
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv
        AND e.ts <= v.tv + INTERVAL {FUNNEL_WINDOW_H} HOUR
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
        AND e.ts <= c.tc + INTERVAL {FUNNEL_WINDOW_H} HOUR
      GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(v.tv) AS BIGINT) AS n_viewed,
           CAST(count(c.tc) AS BIGINT) AS n_clicked_24h,
           CAST(count(p.tp) AS BIGINT) AS n_purchased_24h,
           round(count(p.tp) * 1.0 / count(v.tv), 6) AS view_to_purchase
    FROM u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """


@query("q_funnel_windowed", oracle=_WINDOWED_FUNNEL_ORACLE)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED funnel: each stage must fire within
    {FUNNEL_WINDOW_H} h of the previous one (click ≤ 24 h after first
    view, purchase ≤ 24 h after that click) — the conversion-window
    convention real funnel reports use (a purchase three weeks after
    the view is a different campaign), where q_funnel counts ordered
    stages unboundedly. Same single-shuffle fold, the accumulator
    carries the deadline.

    Stage times are FIRST qualifying events (min after the previous
    stage within its window), matching the oracle's relational
    formulation; advance is strict (> previous stage ts).
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_STAGES)
    )
    evs = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_type"))
        ).alias("evs")
    )
    bound_us = FUNNEL_WINDOW_H * 3600 * 1_000_000
    acc0 = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("tv"),
        F.lit(None).cast("timestamp").alias("tc"),
        F.lit(None).cast("timestamp").alias("tp"),
    )

    def step(acc, x):
        in_c_win = (
            F.unix_micros(x["ts"]) - F.unix_micros(acc["tv"])
        ) <= bound_us
        in_p_win = (
            F.unix_micros(x["ts"]) - F.unix_micros(acc["tc"])
        ) <= bound_us
        adv_v = (acc["stage"] == 0) & (x["event_type"] == "view")
        adv_c = (
            (acc["stage"] == 1)
            & (x["event_type"] == "click")
            & (x["ts"] > acc["tv"])
            & in_c_win
        )
        adv_p = (
            (acc["stage"] == 2)
            & (x["event_type"] == "purchase")
            & (x["ts"] > acc["tc"])
            & in_p_win
        )
        return F.struct(
            F.when(adv_v, 1)
            .when(adv_c, 2)
            .when(adv_p, 3)
            .otherwise(acc["stage"])
            .alias("stage"),
            F.when(adv_v, x["ts"]).otherwise(acc["tv"]).alias("tv"),
            F.when(adv_c, x["ts"]).otherwise(acc["tc"]).alias("tc"),
            F.when(adv_p, x["ts"]).otherwise(acc["tp"]).alias("tp"),
        )

    folded = evs.select(F.aggregate("evs", acc0, step).alias("f"))
    return folded.agg(
        F.count("*").alias("n_users"),
        F.count("f.tv").alias("n_viewed"),
        F.count("f.tc").alias("n_clicked_24h"),
        F.count("f.tp").alias("n_purchased_24h"),
        F.round(F.count("f.tp") / F.count("f.tv"), 6).alias(
            "view_to_purchase"
        ),
    )


_LORENZ_ORACLE = """
    WITH uv AS (
      SELECT user_id, sum(value) AS x FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    ranked AS (
      SELECT x,
             row_number() OVER (ORDER BY x, user_id) AS rn,
             count(*) OVER () AS n,
             sum(x) OVER (ORDER BY x, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_x,
             sum(x) OVER () AS tot
      FROM uv
    )
    SELECT CAST(decile AS INT) AS decile,
           round(max(cum_x / tot), 6) AS cum_value_share
    FROM (
      SELECT *, ceil(rn * 10.0 / n) AS decile FROM ranked
    )
    GROUP BY 1
    """


@query("q_lorenz_curve", oracle=_LORENZ_ORACLE)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of purchase value over users: the cumulative value
    share held by the bottom d/10 of spenders, for each decile — the
    CURVE whose area q_pareto_report's Gini summarizes (plot it to see
    WHERE the inequality lives: a curve hugging zero until decile 9 is
    whale-driven revenue; a straight line is egalitarian).

    Scale: per-user totals are one hash agg; the global order is the
    two-phase range-partitioned rank, and the cumulative sum buckets by
    ``ntile_from_rank(rn, n, P)`` — CLOSED-FORM contiguous rank ranges
    (pid-local cumulative sums + broadcast offsets, the
    q_abc_classification shape at user grain). The bucket is arithmetic
    on the already-exact rank, not a second sampled range exchange: the
    r13 invariance sweep caught the sampled form shifting cumulative
    shares under AQE-off/odd-partition configs (the offset consumer and
    the window consumer each triggered their own boundary sampling —
    see rankutil's module docstring). Decimal-free here because the
    emitted shares are round(6) ratios of full-precision sums on BOTH
    sides, computed in the identical ascending order.
    """
    from pyspark.sql import Window as W

    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        ntile_from_rank,
        two_phase_global_rank,
    )

    e = table(spark, sf_dir, "events")
    # user-sized aggregate, consumed by BOTH the rank pass and the tot
    # scalar — lazily checkpointed so the events scan+agg runs once
    # (guide §2.4); tot's plan over the checkpoint is unchanged, so its
    # double-summation order (and hence its last-ulp value) is too.
    uv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("x"))
        .localCheckpoint(eager=False)
    )
    ranked = two_phase_global_rank(
        uv, [F.col("x"), F.col("user_id")], 8
    )
    ranged = ranked.withColumn(
        "pid", ntile_from_rank(F.col("rn"), F.col("n"), 8)
    )
    psums = ranged.groupBy("pid").agg(F.sum("x").alias("px"))
    off_w = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offs = psums.select(
        "pid",
        F.coalesce(F.sum("px").over(off_w), F.lit(0.0)).alias("off"),
    )
    tot = uv.agg(F.sum("x").alias("tot"))
    local_w = W.partitionBy("pid").orderBy("rn")
    return (
        ranged.join(F.broadcast(offs), "pid")
        .withColumn("cum_x", F.col("off") + F.sum("x").over(local_w))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            F.ceil(F.col("rn") * 10.0 / F.col("n")).cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.round(F.max(F.col("cum_x") / F.col("tot")), 6).alias(
                "cum_value_share"
            )
        )
    )


CUPED_SPLIT = "2024-01-16"  # pre-period = before; experiment = on/after


_CUPED_ORACLE = f"""
    WITH u AS (
      SELECT user_id,
             CAST(instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) % 2 AS variant,
             sum(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_SPLIT}'
                      THEN value ELSE 0 END) AS pre,
             sum(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_SPLIT}'
                      THEN value ELSE 0 END) AS post
      FROM events GROUP BY 1
    ),
    theta AS (
      SELECT covar_pop(post, pre) / var_pop(pre) AS th,
             avg(pre) AS pre_mean
      FROM u
    ),
    adj AS (
      SELECT u.variant,
             u.post AS y,
             u.post - theta.th * (u.pre - theta.pre_mean) AS y_cuped
      FROM u, theta
    )
    SELECT CAST(variant AS INT) AS variant,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(y), 4) AS mean_raw,
           round(avg(y_cuped), 4) AS mean_cuped,
           round(var_pop(y), 4) AS var_raw,
           round(var_pop(y_cuped), 4) AS var_cuped,
           round(1.0 - var_pop(y_cuped) / var_pop(y), 6)
             AS variance_reduction
    FROM adj GROUP BY 1
    """


@query("q_ab_cuped", oracle=_CUPED_ORACLE)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the hash-assigned experiment
    (Deng et al., WSDM'13): adjust each user's experiment-period spend
    by their PRE-period spend, y′ = y − θ(x − x̄) with
    θ = cov(y,x)/var(x) — same means in expectation (randomization ⊥
    pre-period), strictly smaller variance whenever pre correlates
    with post, i.e. the same experiment reads significant with fewer
    users. Reports per-variant raw vs CUPED means/variances and the
    variance-reduction fraction; everything is closed-form one-pass
    aggregates (θ via covar_pop/var_pop — the regress.py posture),
    with the same md5 assignment as q_ab_test.

    θ is fit POOLED across both arms (the standard CUPED recipe —
    fitting per-arm would bias the contrast).
    """
    e = table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("date")
    assign = F.expr(
        "CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(user_id AS STRING)), 1, 1)) - 1 AS BIGINT) % 2"
    )
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.to_date("ts") < split, F.col("value")).otherwise(0.0)
        ).alias("pre"),
        F.sum(
            F.when(F.to_date("ts") >= split, F.col("value")).otherwise(0.0)
        ).alias("post"),
    ).withColumn("variant", assign)
    theta = u.agg(
        (F.covar_pop("post", "pre") / F.var_pop("pre")).alias("th"),
        F.avg("pre").alias("pre_mean"),
    )
    adj = u.crossJoin(F.broadcast(theta)).select(
        "variant",
        F.col("post").alias("y"),
        (
            F.col("post")
            - F.col("th") * (F.col("pre") - F.col("pre_mean"))
        ).alias("y_cuped"),
    )
    return adj.groupBy(F.col("variant").cast("int").alias("variant")).agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("y"), 4).alias("mean_raw"),
        F.round(F.avg("y_cuped"), 4).alias("mean_cuped"),
        F.round(F.var_pop("y"), 4).alias("var_raw"),
        F.round(F.var_pop("y_cuped"), 4).alias("var_cuped"),
        F.round(
            F.lit(1.0) - F.var_pop("y_cuped") / F.var_pop("y"), 6
        ).alias("variance_reduction"),
    )


_POWER_ORACLE = """
    WITH u AS (
      SELECT user_id, sum(value) AS y FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    st AS (
      SELECT avg(y) AS mu, var_pop(y) AS v FROM u
    ),
    grid AS (SELECT unnest([0.01, 0.02, 0.05, 0.10]) AS mde_rel)
    SELECT CAST(round(grid.mde_rel, 2) AS DOUBLE) AS mde_rel,
           round(st.mu * grid.mde_rel, 4) AS mde_abs,
           CAST(ceil(2.0 * power(1.959964 + 0.841621, 2) * st.v
                     / power(st.mu * grid.mde_rel, 2)) AS BIGINT)
             AS n_per_arm
    FROM grid, st
    """


@query("q_power_analysis", oracle=_POWER_ORACLE)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing from observed variance: users per arm needed to
    detect a 1/2/5/10% relative lift in per-user purchase value at
    α=0.05 (two-sided, z=1.959964) with 80% power (z=0.841621) —
    n = 2(z_{{α/2}}+z_β)²σ²/δ², the closed form every experimentation
    platform quotes before a launch (and the reason CUPED matters:
    cut σ² and this table shrinks proportionally).

    Scale: one per-user aggregate → one moment row; the MDE grid is a
    broadcast literal frame. z constants are literals, so both engines
    compute identical doubles.
    """
    e = table(spark, sf_dir, "events")
    u = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("y"))
    )
    st = u.agg(F.avg("y").alias("mu"), F.var_pop("y").alias("v"))
    grid = e.sparkSession.createDataFrame(
        [(0.01,), (0.02,), (0.05,), (0.10,)], "mde_rel double"
    )
    z = (1.959964 + 0.841621) ** 2
    return (
        grid.crossJoin(F.broadcast(st))
        .select(
            F.round("mde_rel", 2).alias("mde_rel"),
            F.round(F.col("mu") * F.col("mde_rel"), 4).alias("mde_abs"),
            F.ceil(
                F.lit(2.0) * F.lit(z) * F.col("v")
                / F.pow(F.col("mu") * F.col("mde_rel"), 2)
            ).cast("bigint").alias("n_per_arm"),
        )
    )


_SRM_ORACLE = """
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST(instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) % 2 AS variant
      FROM events
    ),
    g AS (SELECT variant, count(*) AS n FROM assign GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM g)
    SELECT CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
           round(sum((n - tot.t / 2.0) * (n - tot.t / 2.0))
                 / (tot.t / 2.0), 6) AS chi2,
           sum((n - tot.t / 2.0) * (n - tot.t / 2.0)) / (tot.t / 2.0)
             > 3.841459 AS srm_detected
    FROM g, tot
    GROUP BY tot.t
    """


@query("q_srm_check", oracle=_SRM_ORACLE)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-Ratio Mismatch check for the hash-assigned experiment:
    χ² of the two arm sizes against the intended 50/50 (1 df; flag at
    3.841 = 95%). SRM is the first gate every experimentation platform
    runs — a mismatched split means the assignment or logging is
    broken and EVERY downstream readout (q_ab_test, q_ab_cuped) is
    invalid. Note the md5-first-hex-digit assignment used across this
    suite is 8/8 of 16 digits — exactly 50/50 by construction, so a
    detected SRM here would indicate data loss, not design.

    Scale: one distinct-user aggregate; everything after is 2 rows.
    The flag compares the UNROUNDED statistic on both sides.
    """
    e = table(spark, sf_dir, "events")
    assign = (
        e.select("user_id")
        .distinct()
        .withColumn(
            "variant",
            F.expr(
                "CAST(instr('0123456789abcdef', "
                "substr(md5(CAST(user_id AS STRING)), 1, 1)) - 1 "
                "AS BIGINT) % 2"
            ),
        )
    )
    g = assign.groupBy("variant").agg(F.count("*").alias("n"))
    tot = g.agg(F.sum("n").alias("t"))
    half = F.col("t") / 2.0
    chi2 = F.sum((F.col("n") - half) * (F.col("n") - half)) / F.first(half)
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
            F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 > F.lit(3.841459)).alias("srm_detected"),
        )
        .drop("t")
    )


_WEEKEND_ORACLE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(strftime(ts, '%w') AS INT) IN (0, 6) AS is_weekend,
             sum(CAST(CASE WHEN event_type = 'purchase' THEN value
                      ELSE 0 END AS DECIMAL(18,4))) AS rev
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT is_weekend, count(*) AS n,
             CAST(sum(rev) AS DOUBLE) AS s1,
             CAST(sum(rev * rev) AS DOUBLE) AS s2
      FROM d GROUP BY 1
    ),
    m AS (
      SELECT is_weekend, n, s1 / n AS mu,
             (s2 - s1 * s1 / n) / (n - 1) AS v
      FROM g
    )
    SELECT CAST(w.n AS BIGINT) AS n_weekend_days,
           CAST(x.n AS BIGINT) AS n_weekday_days,
           floor(w.mu * 10000 + 0.5) / 10000.0 AS weekend_mean_rev,
           floor(x.mu * 10000 + 0.5) / 10000.0 AS weekday_mean_rev,
           floor((w.mu - x.mu) * 10000 + 0.5) / 10000.0 AS diff,
           floor((w.mu - x.mu)
                 / sqrt(w.v / w.n + x.v / x.n) * 10000 + 0.5) / 10000.0
             AS welch_t
    FROM m w JOIN m x ON w.is_weekend AND NOT x.is_weekend
    """


@query("q_weekend_effect", oracle=_WEEKEND_ORACLE)
def q_weekend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekend effect, tested: daily purchase revenue on weekend vs
    weekday days with a Welch t statistic (unequal-variance two-sample
    contrast — the correct test when group sizes differ 2:5 by
    construction). The hypothesis-test companion to q_seasonality's
    descriptive χ²: χ² says the week has structure, this says whether
    the WEEKEND specifically pays.

    Determinism: daily revenue lands as DECIMAL(18,4) and the group
    moments come from exact decimal sums (s1, s2) finalized in double
    — float summation ORDER never enters, so the means cannot straddle
    a rounding boundary between engines (a raw double avg did, by half
    an ulp, at sf0.001 — caught by the parity gate).

    Scale: the daily revenue panel first (partial-aggregated), then a
    2-group sums aggregate; the final t is arithmetic on 2 rows.
    """
    e = table(spark, sf_dir, "events")
    d = (
        e.groupBy(
            F.to_date("ts").alias("day"),
            (F.dayofweek("ts") - 1).isin(0, 6).alias("is_weekend"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                )
                .otherwise(0.0)
                .cast("decimal(18,4)")  # per-ROW cast: the day sum is then
                # an exact decimal in both engines; casting the double SUM
                # still rounded differently when a day landed on a .00005
                # boundary (caught twice by the parity gate)
            ).alias("rev")
        )
    )
    g = d.groupBy("is_weekend").agg(
        F.count("*").alias("n"),
        F.sum("rev").cast("double").alias("s1"),
        F.sum(F.col("rev") * F.col("rev")).cast("double").alias("s2"),
    )
    m = g.select(
        "is_weekend",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    w = m.filter(F.col("is_weekend")).select(
        F.col("n").alias("nw"), F.col("mu").alias("mw"), F.col("v").alias("vw")
    )
    x = m.filter(~F.col("is_weekend")).select(
        F.col("n").alias("nx"), F.col("mu").alias("mx"), F.col("v").alias("vx")
    )
    # floor(x*1e4 + 0.5)/1e4, not round(): Spark's round() rounds the
    # double's SHORTEST DECIMAL (BigDecimal.valueOf) while DuckDB rounds
    # the binary value — at an exact representational tie (here: a
    # decimal day-sum / 8 landing on .xxxx5) they disagree by one ulp of
    # the grid. floor(+0.5) evaluates identically in both engines (the
    # q_embedding_quantize discipline). mu itself is deterministic:
    # exact decimal sums cast to double, divided by the same n.
    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000.0

    t = (F.col("mw") - F.col("mx")) / F.sqrt(
        F.col("vw") / F.col("nw") + F.col("vx") / F.col("nx")
    )
    return w.crossJoin(x).select(
        F.col("nw").cast("bigint").alias("n_weekend_days"),
        F.col("nx").cast("bigint").alias("n_weekday_days"),
        r4(F.col("mw")).alias("weekend_mean_rev"),
        r4(F.col("mx")).alias("weekday_mean_rev"),
        r4(F.col("mw") - F.col("mx")).alias("diff"),
        r4(t).alias("welch_t"),
    )


_BOUNCE_ORACLE = """
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    sess AS (
      SELECT user_id, sid, CAST(min(ts) AS DATE) AS day,
             count(*) AS n_events
      FROM s GROUP BY 1, 2
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS bounce_rate
    FROM sess GROUP BY 1
    """


@query("q_bounce_rate", oracle=_BOUNCE_ORACLE)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing a
    single event, bucketed by session-start day — the most-quoted
    engagement metric there is, composed from q_sessionize's lag +
    running-sum sessionization (one user-keyed shuffle) plus a
    |days|-row aggregate.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = (
        flagged.withColumn(
            "sid",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.to_date(F.min("ts")).alias("day"),
            F.count("*").alias("n_events"),
        )
    )
    return sess.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("bounce_rate"),
    )
