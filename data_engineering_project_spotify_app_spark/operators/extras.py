"""Extended analytics surface — operators beyond the reference's own set.

The reference delegates all analytics to BigQuery; the engine declares
them in-scope (SURVEY.md §2.4 note, north star). Everything here is
built-in Spark with a DuckDB oracle; a few queries use ``spark.sql``
directly to exercise the SQL entry path (the engine supports both —
Catalyst produces the same plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube: all grouping-set combinations in one pass."""
    l = table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           round(avg(l_extendedprice), 4)                 AS mean
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.

    Scale note: exact percentile needs a per-group sort — use
    percentile_approx (t-digest-style mergeable sketch) at 100 TB; the
    exact form is the correctness baseline (both engines interpolate
    linearly, so it is oracle-checkable; the sketch is not).
    """
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean"),
    )


@query(
    "q_ntile",
    oracle="""
    SELECT c_custkey, CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey)
           AS BIGINT) AS quartile
    FROM customer
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles by account balance (deterministic tie-break).

    Scale: NOT ``F.ntile(4).over(Window.orderBy(...))`` — a global-order
    window serializes the whole table through one task. The two-phase
    range-partition rank (rankutil.py) yields the exact global
    row_number in parallel; ntile's bucket assignment is then closed-
    form arithmetic on (rn, n): the first ``n mod 4`` buckets hold
    ``floor(n/4)+1`` rows, the rest ``floor(n/4)`` (the SQL-standard
    split both engines implement).
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import two_phase_global_rank

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = two_phase_global_rank(
        c,
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        max(8, spark.sparkContext.defaultParallelism),
    )
    q = F.floor(F.col("n") / 4)  # small-bucket size
    r = F.col("n") % 4  # number of size-(q+1) buckets
    big = r * (q + 1)  # rows covered by the larger buckets
    # greatest(q,1): the otherwise-branch is unreachable when q=0
    # (big = n then), but ANSI mode evaluates the divisor eagerly
    tile = F.when(
        F.col("rn") <= big, F.floor((F.col("rn") - 1) / (q + 1)) + 1
    ).otherwise(
        r + F.floor((F.col("rn") - big - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return ranked.select(
        "c_custkey", tile.cast("bigint").alias("quartile")
    )


@query(
    "q_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w  AS last_order
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order per customer over an unbounded frame."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).distinct()


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS name_upper,
           substr(p_name, 1, 5)                AS name_prefix,
           length(p_name)                      AS name_len,
           replace(p_type, ' ', '_')           AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (F1/F2-adjacent: the engine's scalar layer)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.size(F.split("p_name", " ", -1)).cast("bigint").alias("n_words"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)      AS y,
           CAST(quarter(o_orderdate) AS BIGINT)   AS q,
           CAST(month(o_orderdate) AS BIGINT)     AS m,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY          AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_95
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface over the order timeline."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("days_since_95"),
    )


@query(
    "q_array_funcs",
    oracle=r"""
    SELECT doc_id,
           tok[1]                                   AS first_tok,
           tok[len(tok)]                            AS last_tok,
           CAST(len(list_distinct(tok)) AS BIGINT)  AS n_distinct,
           list_sort(list_distinct(tok))[1]         AS min_tok,
           CAST(list_contains(tok, 'the') AS BOOLEAN) AS has_the,
           array_to_string(list_sort(list_distinct(tok))[1:3], ',') AS top3_sorted
    FROM (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tok
      FROM documents
    )
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over tokenized documents (explode-free)."""
    from data_engineering_project_spotify_app_spark.functions.text import tokens

    d = table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    distinct_sorted = F.array_sort(F.array_distinct(tok))
    return d.select(
        "doc_id",
        F.element_at(tok, 1).alias("first_tok"),
        F.element_at(tok, -1).alias("last_tok"),
        F.size(F.array_distinct(tok)).cast("bigint").alias("n_distinct"),
        F.element_at(distinct_sorted, 1).alias("min_tok"),
        F.array_contains(tok, "the").alias("has_the"),
        F.array_join(F.slice(distinct_sorted, 1, 3), ",").alias("top3_sorted"),
    )


@query(
    "q_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + post-aggregation predicate (HAVING)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "q_count_if",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(*) FILTER (WHERE value > 50)  AS n_high,
           count(*) FILTER (WHERE value <= 50) AS n_low
    FROM events GROUP BY event_type
    """,
)
def q_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.count_if(F.col("value") <= 50).alias("n_low"),
    )


@query(
    "q_sql_entrypoint",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers,
           round(avg(c.c_acctbal), 4) AS avg_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
)
def q_sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry path: EXISTS subquery + join + agg as raw SQL.

    Same Catalyst plan as the DataFrame form — registered views make the
    whole fixture catalog SQL-addressable (SURVEY.md §3 entry point 2).
    """
    for t in ("customer", "nation", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, count(*) AS n_customers,
               round(avg(c.c_acctbal), 4) AS avg_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY n.n_name
        """
    )


@query(
    "q_salted_join",
    oracle="""
    SELECT s.s_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join: identical semantics to the plain join
    (the oracle IS the plain join) with the hot-key mitigation built in.

    The supplier key is heavily skewed (few suppliers, ~600k lineitems at
    sf0.1). Salting: fact rows get a random-ish salt from their own row
    content (deterministic — crc32 of orderkey), the dim side is
    replicated once per salt, and the join key becomes (key, salt) so one
    hot key spreads over SALT_BUCKETS reducers. Two-phase aggregation
    restores the per-key result. At 100 TB with AQE, prefer
    spark.sql.adaptive.skewJoin (runtime split); salting is the explicit
    form for when a single key exceeds even AQE's split ability.
    """
    SALT_BUCKETS = 8
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")

    salted_fact = l.withColumn(
        "salt", F.pmod(F.crc32(F.col("l_orderkey").cast("string")), F.lit(SALT_BUCKETS))
    )
    salted_dim = s.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    # phase 1: partial agg per (key, salt) — spreads the hot key
    partial = (
        salted_fact.join(
            salted_dim,
            (salted_fact.l_suppkey == salted_dim.s_suppkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("s_name", salted_fact.salt)
        .agg(
            # DECIMAL partials: the two-phase sum adds in a different
            # order than the oracle's one-pass sum — a per-supplier
            # revenue landed on a round-half boundary at sf0.1. Decimal
            # addition is exact/order-independent (q_tpch_q10 convention).
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount").cast("decimal(18,4)"))
            ).alias("rev_part"),
            F.count("*").alias("n_part"),
        )
    )
    # phase 2: final agg per key
    return partial.groupBy("s_name").agg(
        F.round(F.sum("rev_part"), 2).cast("double").alias("revenue"),
        F.sum("n_part").alias("n_items"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (the general form behind rollup/cube)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT event_type, 'value' AS metric, round(sum(value), 2) AS v
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'count' AS metric, CAST(count(*) AS DOUBLE) AS v
    FROM events GROUP BY event_type
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-type metrics back to long form via stack."""
    e = table(spark, sf_dir, "events")
    wide = e.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("value"),
        F.count("*").cast("double").alias("count"),
    )
    return wide.selectExpr(
        "event_type",
        "stack(2, 'value', value, 'count', count) AS (metric, v)",
    )


@query(
    "q_trailing_30d",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 2) AS trailing_30d_spend
    FROM orders
    """,
)
def q_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer trailing-30-day spend.

    Value-based frame (all orders within 30 days), not row-based — both
    engines compute it over epoch seconds so the frame bounds are
    identical numerics.
    """
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_spend"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      -- dedup same-user same-instant purchases deterministically
      SELECT user_id, ts, max(event_id) AS purchase_id
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase')
      GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, p.purchase_id AS asof_purchase_id
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — Spark has no native one; composed via the sorted-merge
    trick (pyspark guide "common OLAP patterns"): union both sides with a
    side tag, one partitioned window, last(ignorenulls) carries the most
    recent right-side key forward. The oracle is DuckDB's NATIVE ASOF
    JOIN, so the composition is checked against a first-class
    implementation.

    For each click, the most recent purchase by the same user at or
    before the click.

    Scale: ONE shuffle (by user), no range-explosion join, state is one
    row per input row — the merge formulation is how as-of joins stay
    linear at 100 TB (vs the quadratic naive range join).
    """
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )

    tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("purchase_id"),
        F.lit(0).alias("side"),  # purchases sort BEFORE clicks at equal ts
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            "event_id",
            F.lit(None).cast("bigint").alias("purchase_id"),
            F.lit(1).alias("side"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "asof_purchase_id", F.last("purchase_id", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id", "user_id", "asof_purchase_id"
    )


@query("q_approx_quantile")  # no oracle: sketch values are engine-specific
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (KLL-style sketch) — the 100 TB path for
    q_percentiles: one pass, mergeable, no per-group sort. Error bound vs
    the exact form is pinned in tests/test_sketches.py."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_approx"),
    )


@query(
    "q_rank_functions",
    oracle="""
    SELECT c_custkey,
           CAST(rank() OVER w AS BIGINT)        AS rnk,
           CAST(dense_rank() OVER w AS BIGINT)  AS drnk,
           round(percent_rank() OVER w, 6)      AS prnk,
           round(cume_dist() OVER w, 6)         AS cdist
    FROM customer
    WINDOW w AS (ORDER BY round(c_acctbal, 2) DESC, c_custkey)
    """,
)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one ordered window.

    Ordering is on the ROUNDED balance so rank ties are identical in
    both engines regardless of last-ulp double differences.

    Scale: no global-order window (one task holding the table). The
    window's ORDER BY ends in the unique c_custkey, so the ordering is
    a TOTAL order — rank == dense_rank == row_number, percent_rank ==
    (rn-1)/(n-1), cume_dist == rn/n — all closed-form over the
    two-phase parallel global row_number (rankutil.py). Same doubles
    as the window functions compute internally, so round(,6) matches
    the oracle bit-for-bit.
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import two_phase_global_rank

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("_bal2")
    )
    ranked = two_phase_global_rank(
        c,
        [F.col("_bal2").desc(), F.col("c_custkey")],
        max(8, spark.sparkContext.defaultParallelism),
    )
    # n == 1 guard: percent_rank is defined as 0 when there is a single
    # row (both engines), and ANSI mode would otherwise error on 0/0
    prnk = F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
        (F.col("rn") - 1).cast("double") / (F.col("n") - 1)
    )
    return ranked.select(
        "c_custkey",
        F.col("rn").cast("bigint").alias("rnk"),
        F.col("rn").cast("bigint").alias("drnk"),
        F.round(prnk, 6).alias("prnk"),
        F.round(F.col("rn").cast("double") / F.col("n"), 6).alias("cdist"),
    )


@query(
    "q_correlated_subquery",
    oracle="""
    SELECT c.c_custkey,
           round((SELECT max(o.o_totalprice) FROM orders o
                  WHERE o.o_custkey = c.c_custkey), 2) AS max_order,
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
    FROM customer c
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries through the SQL path.

    Catalyst DECORRELATES these into a left outer aggregate-join — the
    plan a hand-written join would produce; the per-row subquery never
    executes per-row. The optimizer showcase for SQL users migrating
    from the reference's BigQuery surface.
    """
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey,
               round((SELECT max(o.o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_order,
               CAST((SELECT count(*) FROM orders o
                     WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
        FROM customer c
        """
    )


@query(
    "q_json_props",
    oracle="""
    SELECT k % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    WHERE k IS NOT NULL
    GROUP BY 1
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from the events payload column with a REAL
    JSON parser — from_json with a declared schema (not the regexp
    shortcut q_nested_path demonstrates), aggregated per k-bucket.

    Scale: from_json runs inside codegen (Jackson per row, no Python);
    the declared schema means malformed payloads yield NULL (filtered
    here) instead of failing the job — the lenient-extract / strict-
    landing contract from SURVEY.md §1.2.
    """
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k")
    )
    return (
        parsed.filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


@query(
    "q_url_decode",
    oracle="""
    SELECT p_partkey,
           replace(p_name, ' ', '%20') AS encoded,
           p_name AS decoded,
           'Hello, World!' AS probe
    FROM part
    """,
)
def q_url_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: URL percent-decoding as an engine function (SURVEY §2.8 —
    the reference quotes artist names into request URLs, app.py:140;
    the engine-side inverse is F.url_decode). The oracle states the
    EXPECTED plaintext directly (this DuckDB build has no url_decode),
    so the hash compare proves Spark's decoder actually inverts the
    encoding: per-row space decoding plus a constant all-hex probe
    ('%48%65%6C%6C%6F%2C%20%57%6F%72%6C%64%21' → 'Hello, World!').
    Codegen scalar function — no UDF, no shuffle.
    """
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit(" "), F.lit("%20")).alias("encoded"),
        F.url_decode(
            F.replace(F.col("p_name"), F.lit(" "), F.lit("%20"))
        ).alias("decoded"),
        F.url_decode(
            F.lit("%48%65%6C%6C%6F%2C%20%57%6F%72%6C%64%21")
        ).alias("probe"),
    )


KMV_K = 256
_KMV_HEX2INT = (
    "("
    + " + ".join(
        f"CAST(instr('0123456789abcdef', substr(d, {1 + k}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (7 - k)}"
        for k in range(8)
    )
    + ")"
)


@query(
    "q_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             {_KMV_HEX2INT} AS hv
      FROM (
        SELECT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS d
        FROM lineitem
      )
    ),
    ranked AS (
      SELECT l_returnflag, hv,
             dense_rank() OVER (
               PARTITION BY l_returnflag ORDER BY hv
             ) AS dr
      FROM h
    ),
    kmin AS (
      SELECT l_returnflag,
             max(hv) AS kth,
             count(DISTINCT hv) AS m
      FROM ranked WHERE dr <= {KMV_K}
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(m AS BIGINT) AS n_kmin,
           round(CASE WHEN m < {KMV_K} THEN CAST(m AS DOUBLE)
                      ELSE ({KMV_K} - 1) * 4294967296.0 / kth END,
                 1) AS est_distinct
    FROM kmin
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch — the approximate
    sketch that IS exactly oracle-checkable, unlike HLL
    (q_approx_distinct stays rows-only because engines implement
    different HLL variants): both engines derive the same md5-based
    hash space, so the k smallest hash values — and therefore the
    estimate (k-1)/m_k — are bit-identical. Beyer et al. 2007
    ("On synopses for distinct-value estimation"); expected relative
    error ~ 1/sqrt(k-2) ≈ 6% at k=256 (pinned in tests).

    Scale: dense_rank <= k over (group, hv) is optimized by
    InferWindowGroupLimit into a per-partition group-limit — each map
    task forwards at most k distinct hashes per group, so the shuffle
    carries O(groups × k × partitions) rows no matter how many
    billions of raw rows scan; duplicates collapse via dense_rank
    (KMV needs the k smallest DISTINCT hashes, so no pre-distinct
    pass is needed). Groups with fewer than k distinct values return
    the exact count (m < k ⇒ estimate = m).
    """
    k = KMV_K
    h = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 8), "
            "16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    kmin = (
        h.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
        .groupBy("l_returnflag")
        .agg(
            F.max("hv").alias("kth"),
            F.count_distinct("hv").alias("m"),
        )
    )
    est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(F.lit((k - 1) * 4294967296.0) / F.col("kth"))
    return kmin.select(
        "l_returnflag",
        F.col("m").cast("bigint").alias("n_kmin"),
        F.round(est, 1).alias("est_distinct"),
    )


@query(
    "q_kmv_set_ops",
    oracle=f"""
    WITH hv_all AS (
      SELECT event_type,
             {_KMV_HEX2INT} AS hv
      FROM (
        SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS d FROM events
        WHERE event_type IN ('click', 'purchase')
      )
    ),
    ka AS (
      SELECT hv FROM (
        SELECT hv, dense_rank() OVER (ORDER BY hv) AS dr
        FROM hv_all WHERE event_type = 'click'
      ) WHERE dr <= {KMV_K} GROUP BY hv
    ),
    kb AS (
      SELECT hv FROM (
        SELECT hv, dense_rank() OVER (ORDER BY hv) AS dr
        FROM hv_all WHERE event_type = 'purchase'
      ) WHERE dr <= {KMV_K} GROUP BY hv
    ),
    sa AS (SELECT max(hv) AS kth_a, count(*) AS m_a FROM ka),
    sb AS (SELECT max(hv) AS kth_b, count(*) AS m_b FROM kb),
    ab AS (
      SELECT *,
             CASE WHEN m_a < {KMV_K} THEN 4294967296
                  ELSE kth_a + 1 END AS theta_a,
             CASE WHEN m_b < {KMV_K} THEN 4294967296
                  ELSE kth_b + 1 END AS theta_b
      FROM sa CROSS JOIN sb
    ),
    ab2 AS (SELECT *, least(theta_a, theta_b) AS theta_s FROM ab),
    ci AS (
      SELECT count(*) AS c_inter
      FROM ka JOIN kb USING (hv) CROSS JOIN ab2
      WHERE hv < theta_s
    )
    SELECT
      round(CASE WHEN m_a < {KMV_K} THEN CAST(m_a AS DOUBLE)
                 ELSE ({KMV_K} - 1) * 4294967296.0 / kth_a END, 1)
        AS est_clickers,
      round(CASE WHEN m_b < {KMV_K} THEN CAST(m_b AS DOUBLE)
                 ELSE ({KMV_K} - 1) * 4294967296.0 / kth_b END, 1)
        AS est_purchasers,
      round(c_inter * 4294967296.0 / theta_s, 1) AS est_both,
      round(CASE WHEN m_a < {KMV_K} THEN CAST(m_a AS DOUBLE)
                 ELSE ({KMV_K} - 1) * 4294967296.0 / kth_a END
            + CASE WHEN m_b < {KMV_K} THEN CAST(m_b AS DOUBLE)
                   ELSE ({KMV_K} - 1) * 4294967296.0 / kth_b END
            - c_inter * 4294967296.0 / theta_s, 1) AS est_either
    FROM ab2 CROSS JOIN ci
    """,
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA over KMV/theta sketches: distinct clickers,
    distinct purchasers, and — without ever materializing either set —
    the intersection and union cardinalities, from the two k-min
    sketches alone (the theta-sketch estimators: θ* = min θ_A θ_B,
    |A∩B| ≈ |retained_A ∩ retained_B ∩ [0,θ*)| / θ*, union by
    inclusion-exclusion). This mergeability is the whole point of
    sketches at 100 TB: per-partition sketches union by keeping the k
    smallest of each merge, so overlap questions across huge sets
    resolve from O(k) state.

    Same shared md5 hash space as q_kmv_distinct ⇒ bit-identical
    estimates in both engines — fully hash-checked despite being an
    approximate operator. Accuracy vs exact overlap pinned in
    tests/test_sketches.py.
    """
    k = KMV_K
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    hv_all = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), "
            "16, 10) AS BIGINT)"
        ).alias("hv"),
    )

    # ONE tag-partitioned window computes both sketches' k-mins in a
    # single pass (VERDICT r11 item 6 — previously two filtered
    # unpartitioned windows over the same frame); dense_rank ≤ k with a
    # partitionBy is map-side group-limited (WindowGroupLimit), and the
    # ≤ 2k-row result is a lazy localCheckpoint so its four consumers
    # (two 1-row aggregates + the intersection join's two sides) don't
    # re-run the window.
    w = Window.partitionBy("event_type").orderBy("hv")
    kmins = (
        hv_all.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
        .select("event_type", "hv")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ka = kmins.filter(F.col("event_type") == "click").select("hv")
    kb = kmins.filter(F.col("event_type") == "purchase").select("hv")
    sa = ka.agg(F.max("hv").alias("kth_a"), F.count("*").alias("m_a"))
    sb = kb.agg(F.max("hv").alias("kth_b"), F.count("*").alias("m_b"))
    full = F.lit(4294967296)
    ab = (
        sa.crossJoin(sb)
        .withColumn(
            "theta_a",
            F.when(F.col("m_a") < k, full).otherwise(F.col("kth_a") + 1),
        )
        .withColumn(
            "theta_b",
            F.when(F.col("m_b") < k, full).otherwise(F.col("kth_b") + 1),
        )
        .withColumn("theta_s", F.least("theta_a", "theta_b"))
    )
    ci = (
        ka.join(kb, "hv")
        .crossJoin(F.broadcast(ab.select("theta_s")))
        .filter(F.col("hv") < F.col("theta_s"))
        .agg(F.count("*").alias("c_inter"))
    )
    est_a = F.when(F.col("m_a") < k, F.col("m_a").cast("double")).otherwise(
        F.lit((k - 1) * 4294967296.0) / F.col("kth_a")
    )
    est_b = F.when(F.col("m_b") < k, F.col("m_b").cast("double")).otherwise(
        F.lit((k - 1) * 4294967296.0) / F.col("kth_b")
    )
    est_i = F.col("c_inter") * F.lit(4294967296.0) / F.col("theta_s")
    return ab.crossJoin(ci).select(
        F.round(est_a, 1).alias("est_clickers"),
        F.round(est_b, 1).alias("est_purchasers"),
        F.round(est_i, 1).alias("est_both"),
        F.round(est_a + est_b - est_i, 1).alias("est_either"),
    )


KMV_MERGE_K = 64
KMV_MERGE_SHARDS = 8


@query(
    "q_kmv_merge",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             user_id % {KMV_MERGE_SHARDS} AS shard,
             {_KMV_HEX2INT} AS hv
      FROM (
        SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS d
        FROM events
      )
    ),
    ranked AS (
      SELECT event_type, hv,
             dense_rank() OVER (
               PARTITION BY event_type ORDER BY hv
             ) AS dr
      FROM h
    ),
    kmin AS (
      SELECT event_type,
             max(hv) AS kth,
             count(DISTINCT hv) AS m
      FROM ranked WHERE dr <= {KMV_MERGE_K}
      GROUP BY event_type
    ),
    shards AS (
      SELECT event_type, count(DISTINCT shard) AS n_shards FROM h GROUP BY 1
    )
    SELECT k.event_type,
           CAST(s.n_shards AS BIGINT) AS n_shards,
           CAST(k.m AS BIGINT) AS n_kmin,
           round(CASE WHEN k.m < {KMV_MERGE_K} THEN CAST(k.m AS DOUBLE)
                      ELSE ({KMV_MERGE_K} - 1) * 4294967296.0 / k.kth END,
                 1) AS est_distinct
    FROM kmin k JOIN shards s USING (event_type)
    """,
)
def q_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGE — the UDAF-shaped two-level aggregation that is
    how every sketch actually runs on a cluster: each shard (standing in
    for an executor/partition/day of data) builds its own k-min sketch
    independently, the sketches are materialized as explicit O(k)
    array<bigint> state, and a second-level merge unions them and
    re-truncates to the k smallest distinct values. The oracle computes
    the GLOBAL k-min directly — hash-equality of the two results is the
    proof that KMV merge is lossless (the global k smallest distinct
    hashes are a subset of the union of per-shard k smallest, because a
    value in the global top-k has at most k-1 smaller values anywhere).

    Shard assignment is pmod(user_id, 8) — deterministic, and since hv
    is a function of user_id every duplicate lands in the same shard, so
    per-shard distinctness is global distinctness. (spark_partition_id
    would be nondeterministic under AQE and break the oracle.)

    Scale: both levels are WindowGroupLimit-pruned (dense_rank ≤ k over
    a rank window compiles to a per-map-task group limit), so level 0
    forwards at most k hashes per (type, shard) per map task and the
    merge input is O(types × shards × k) rows total — independent of raw
    row count. At 100 TB with shard = ingest day, sketches persist as
    tiny array columns and any date-range distinct-count resolves from
    merged O(k) state without rescanning the fact table.
    """
    k = KMV_MERGE_K
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(KMV_MERGE_SHARDS)).alias("shard"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), "
            "16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    w0 = Window.partitionBy("event_type", "shard").orderBy("hv")
    sketches = (
        h.withColumn("dr", F.dense_rank().over(w0))
        .filter(F.col("dr") <= k)
        .groupBy("event_type", "shard")
        .agg(F.sort_array(F.collect_set("hv")).alias("sketch"))
    )
    w1 = Window.partitionBy("event_type").orderBy("hv")
    merged = (
        sketches.select("event_type", F.explode("sketch").alias("hv"))
        .withColumn("dr", F.dense_rank().over(w1))
        .filter(F.col("dr") <= k)
        .groupBy("event_type")
        .agg(
            F.max("hv").alias("kth"),
            F.count_distinct("hv").alias("m"),
        )
    )
    n_shards = sketches.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_shards")
    )
    est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(F.lit((k - 1) * 4294967296.0) / F.col("kth"))
    return merged.join(n_shards, "event_type").select(
        "event_type",
        "n_shards",
        F.col("m").cast("bigint").alias("n_kmin"),
        F.round(est, 1).alias("est_distinct"),
    )


CMS_W = 256  # columns per row
CMS_D = 4    # independent hash rows
_CMS_KEYS = tuple(range(1, 11))  # query keys: user_ids 1..10


def _cms_hash_sql(r: int) -> str:
    """DuckDB twin of the salted md5 bucket for CMS row ``r``."""
    inner = f"md5('{r}:' || CAST(user_id AS VARCHAR))"
    return (
        "("
        + " + ".join(
            f"CAST(instr('0123456789abcdef', substr({inner}, {1 + k}, 1)) "
            f"- 1 AS BIGINT) * {16 ** (7 - k)}"
            for k in range(8)
        )
        + f") % {CMS_W}"
    )


@query(
    "q_countmin_freq",
    oracle=f"""
    WITH cells AS (
      {" UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_hash_sql(r)} AS c, count(*) AS cnt "
        f"FROM events GROUP BY 2"
        for r in range(CMS_D)
      )}
    ),
    keys AS (
      SELECT unnest({list(_CMS_KEYS)}) AS user_id
    ),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT user_id, {r} AS r, {_cms_hash_sql(r)} AS c FROM keys"
        for r in range(CMS_D)
      )}
    ),
    est AS (
      SELECT p.user_id, min(coalesce(cells.cnt, 0)) AS est_count
      FROM probes p LEFT JOIN cells ON cells.r = p.r AND cells.c = p.c
      GROUP BY 1
    ),
    exact AS (
      SELECT user_id, count(*) AS exact_count FROM events
      WHERE user_id IN {_CMS_KEYS}
      GROUP BY 1
    )
    SELECT e.user_id,
           CAST(coalesce(x.exact_count, 0) AS BIGINT) AS exact_count,
           CAST(e.est_count AS BIGINT) AS est_count
    FROM est e LEFT JOIN exact x USING (user_id)
    """,
)
def q_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
    point-query sketch the KMV family can't answer: how often did THIS
    key occur, from O(W×D) mergeable state instead of a full groupBy.
    Unlike Misra-Gries, CMS cells are pure sums — order-independent and
    additive — so the sketch is exactly reproducible in both engines
    (fully hash-checked, unlike the rows-only HLL/t-digest rungs) and
    per-partition sketches merge by cell-wise addition, the same
    merge-as-aggregation contract q_kmv_merge pins for distinct counts.

    D=4 salted md5 hash rows × W=256 columns; estimate = min over rows
    of the addressed cell (one-sided error: est ≥ exact always, inflated
    only by collisions — ε ≈ e/W ≈ 1% of total mass per probe).
    Probed keys user_id 1..10; exact counts joined alongside so the
    driver row also witnesses the overestimate invariant.

    Scale: each hash row is a map-side-combined groupBy over W buckets
    — the shuffle carries ≤ W×D×partitions rows regardless of raw
    count; the W×D cell table and the 10-key probe frame both
    broadcast. The D scans collapse to one via a posexplode over the D
    salted hashes (one pass over events, not D).
    """
    ev = table(spark, sf_dir, "events")
    # one pass: explode the D salted hashes per row
    hashes = F.array(
        *[
            (
                F.expr(
                    f"CAST(conv(substring(md5(concat('{r}:', "
                    "CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
                )
                % CMS_W
            )
            for r in range(CMS_D)
        ]
    )
    cells = (
        ev.select(F.posexplode(hashes).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    keys = spark.createDataFrame(
        [(k,) for k in _CMS_KEYS], "user_id bigint"
    )
    probes = keys.select(
        "user_id",
        F.posexplode(
            F.array(
                *[
                    (
                        F.expr(
                            f"CAST(conv(substring(md5(concat('{r}:', "
                            "CAST(user_id AS STRING))), 1, 8), 16, 10) "
                            "AS BIGINT)"
                        )
                        % CMS_W
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("r", "c"),
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "c"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
    exact = (
        ev.filter(F.col("user_id").isin(*_CMS_KEYS))
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_count"))
    )
    return est.join(exact, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("exact_count"), F.lit(0))
        .cast("bigint")
        .alias("exact_count"),
        F.col("est_count").cast("bigint").alias("est_count"),
    )


@query(
    "q_cms_join_size",
    oracle=f"""
    WITH ca AS (
      {" UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_hash_sql(r)} AS c, count(*) AS cnt "
        f"FROM events WHERE event_type = 'click' GROUP BY 2"
        for r in range(CMS_D)
      )}
    ),
    cb AS (
      {" UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_hash_sql(r)} AS c, count(*) AS cnt "
        f"FROM events WHERE event_type = 'purchase' GROUP BY 2"
        for r in range(CMS_D)
      )}
    ),
    ip AS (
      SELECT ca.r, sum(ca.cnt * cb.cnt) AS dot
      FROM ca JOIN cb USING (r, c)
      GROUP BY 1
    ),
    est AS (SELECT min(dot) AS est_join_size FROM ip),
    exact AS (
      SELECT count(*) AS exact_join_size
      FROM (SELECT user_id FROM events WHERE event_type = 'click') a
      JOIN (SELECT user_id FROM events WHERE event_type = 'purchase') b
        USING (user_id)
    )
    SELECT CAST(exact.exact_join_size AS BIGINT) AS exact_join_size,
           CAST(est.est_join_size AS BIGINT) AS est_join_size
    FROM est CROSS JOIN exact
    """,
)
def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from two Count-Min sketches (the AMS-style
    inner product): |clicks ⋈ purchases on user_id| ≈ min over hash
    rows of Σ_c cellsA[r][c]·cellsB[r][c] — the cardinality-estimation
    primitive a cost-based optimizer needs BEFORE running the join,
    answered from two O(W×D) sketches instead of either input. Same
    one-sided guarantee as the point query (est ≥ exact, collisions
    only inflate), pinned in tests.

    Exactly oracle-checked like q_countmin_freq: cells are pure sums,
    the inner product is a sum of products — order-independent in both
    engines (integer arithmetic throughout, no float rounding at all).

    Scale: each side's sketch is a map-side-combined W-bucket groupBy;
    the inner product joins two ≤W×D cell tables (KBs — broadcast);
    the exact twin (computed alongside for the driver row) is the only
    corpus-sized join, and a production caller would SKIP it — that is
    the point of the estimator.
    """
    ev = table(spark, sf_dir, "events")

    def cells(etype: str) -> DataFrame:
        hashes = F.array(
            *[
                (
                    F.expr(
                        f"CAST(conv(substring(md5(concat('{r}:', "
                        "CAST(user_id AS STRING))), 1, 8), 16, 10) "
                        "AS BIGINT)"
                    )
                    % CMS_W
                )
                for r in range(CMS_D)
            ]
        )
        return (
            ev.filter(F.col("event_type") == etype)
            .select(F.posexplode(hashes).alias("r", "c"))
            .groupBy("r", "c")
            .agg(F.count("*").alias("cnt"))
        )

    ca, cb = cells("click"), cells("purchase")
    est = (
        ca.join(cb.withColumnRenamed("cnt", "cnt_b"), ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("dot"))
        .agg(F.min("dot").cast("bigint").alias("est_join_size"))
    )
    clicks = ev.filter("event_type = 'click'").select("user_id")
    purch = ev.filter("event_type = 'purchase'").select("user_id")
    exact = (
        clicks.join(purch, "user_id")
        .agg(F.count("*").cast("bigint").alias("exact_join_size"))
    )
    return exact.crossJoin(F.broadcast(est))


_STATS_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
)


@query(
    "q_table_stats",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS col,
               count(*) AS n_rows,
               count({c}) AS n_nonnull,
               count(DISTINCT {c}) AS ndv,
               round(min({c}), 2) AS min_val,
               round(max({c}), 2) AS max_val,
               round(avg({c}), 4) AS avg_val
        FROM lineitem'''
        for c in _STATS_COLS
    )}
    """,
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics — the cost-based-optimizer input
    every engine maintains: per column, row/non-null counts, exact NDV,
    min/max, mean. These are the numbers behind join reordering,
    broadcast decisions, and range-partition sizing; Spark's own
    `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` produces the
    same shape into the catalog — this query materializes them as data
    so pipelines can diff stats across snapshots (the schema-drift
    check DQ suites build on).

    ONE corpus pass: all five columns' aggregates run in a single
    hash-aggregate stage over one scan (count_distinct per column makes
    it a multi-distinct plan — Spark expands to `expand` + one
    aggregation, still one scan); the UNION-ALL oracle re-reads per
    column but computes identical values. At 100 TB swap exact NDV for
    approx_count_distinct — here exactness keeps the hash check.
    """
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _STATS_COLS:
        aggs.append(
            F.struct(
                F.lit(c).alias("col"),
                F.count("*").alias("n_rows"),
                F.count(c).alias("n_nonnull"),
                F.count_distinct(F.col(c)).alias("ndv"),
                F.round(F.min(c).cast("double"), 2).alias("min_val"),
                F.round(F.max(c).cast("double"), 2).alias("max_val"),
                F.round(F.avg(c), 4).alias("avg_val"),
            ).alias(c)
        )
    one = li.agg(*aggs)
    stacked = one.select(
        F.explode(F.array(*[F.col(c) for c in _STATS_COLS])).alias("s")
    )
    return stacked.select("s.*")


_VARIANT_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT)
             AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT)
             AS max_k,
           round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k
    FROM events
    GROUP BY 1
    """


@query("q_variant_props", oracle=_VARIANT_ORACLE)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` paths — the modern engine surface for JSON columns
    (shredded binary layout; path access without per-row string
    re-parsing, unlike q_json_props' get_json_object which re-parses
    the text per extraction). Same answers, different storage story —
    at 100 TB you'd land the column AS variant at ingest and this
    query's scan never touches JSON text at all.
    """
    e = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )
