"""Core relational operators — the reference's dataflow surface (SURVEY.md §2).

Each query re-expresses one operator the reference implements imperatively
(reference file:line cited per query) as a declarative DataFrame plan, so
Catalyst gets pushdown/pruning/join-selection and AQE sizes the shuffles.

Scale notes (100 TB posture):
- point lookups / key-set joins: the id side is broadcast when small;
  otherwise AQE picks sort-merge with skew handling — no collect() loops.
- pagination (q_page_slice) needs a global order: expressed as
  row_number over a single ordered window. At 100 TB you'd page with a
  keyset predicate (WHERE pk > last_key LIMIT n, i.e. q_keyset_page) —
  both forms are provided; keyset is the scale path.
- unions are by-name (the reference merges dict rows, not positions —
  app.py:156, 205).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table


# ---------------------------------------------------------------------------
# S-layer: scans (SURVEY.md §2.1)
# ---------------------------------------------------------------------------


@query(
    "q_search_limit1",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name LIKE '%1%'
    ORDER BY c_custkey
    LIMIT 1
    """,
)
def q_search_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/L1: search scan with predicate + limit-1 (app.py:140–145).

    The reference's artist search: filter by name match, take the first
    hit deterministically (API relevance order → here: key order).
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").contains("1"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(1)
    )


@query(
    "q_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_custkey = 42
    """,
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: point lookup by primary key (app.py:147–149).

    Declarative filter → parquet PushedFilters; at scale this is a
    partition-pruned scan, not a driver-side fetch.
    """
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == 42).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@query(
    "q_page_slice",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    )
    WHERE rn BETWEEN 51 AND 100
    """,
)
def q_page_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/W1/L2: stable pagination = global row numbering (app.py:152–163).

    The reference pages the albums endpoint with offset/limit; the
    observable semantics are a stable slice of a totally ordered set.

    rank(), not row_number(): o_orderkey is unique so the order is total
    and the two are identical — but only rank()/dense_rank() get the
    WindowGroupLimit map-side prune on this Spark build; row_number()
    would funnel all of ``orders`` through an Exchange SinglePartition.
    (q_keyset_page below is still the preferred 100 TB form — no global
    rank at all.)
    """
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("rn", F.rank().over(w).cast("bigint"))
        .filter(F.col("rn").between(51, 100))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "q_keyset_page",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderkey > 200
    ORDER BY o_orderkey
    LIMIT 50
    """,
)
def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 at scale: keyset pagination (the 100 TB form of q_page_slice).

    No global window — a pushed-down range predicate plus an ordered
    limit; TakeOrderedAndProject, no full sort, no single-partition window.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") > 200)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "q_child_scan",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_partkey,
           round(l.l_quantity, 2) AS quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_custkey = 7
    """,
)
def q_child_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: correlated child scan — per-parent fan-out (app.py:183–189).

    The reference loops "for each album, fetch its tracks"; relationally
    that is parent ⋈ child on the parent key. The parent side after the
    filter is tiny → Catalyst broadcasts it (no shuffle of lineitem).
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    parents = o.filter(F.col("o_custkey") == 7).select("o_orderkey")
    return (
        F.broadcast(parents)
        .join(l, parents.o_orderkey == l.l_orderkey)
        .select(
            "o_orderkey",
            "l_linenumber",
            "l_partkey",
            F.round("l_quantity", 2).alias("quantity"),
        )
    )


@query(
    "q_batch_enrich",
    oracle="""
    SELECT i.l_partkey, p.p_name, p.p_brand, round(p.p_retailprice, 2) AS retailprice
    FROM (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity > 45) i
    JOIN part p ON i.l_partkey = p.p_partkey
    """,
)
def q_batch_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/J1/O1: dedup-then-enrich key-set join (app.py:164→167–177).

    The reference's batched multi-get (20/50 ids per request) is a key-set
    inner join; the manual `set()` dedup before it is DISTINCT pushed
    below the join — here both are declarative and Catalyst/AQE choose
    the join strategy (broadcast for a small id set).
    """
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    ids = l.filter(F.col("l_quantity") > 45).select("l_partkey").distinct()
    return ids.join(p, ids.l_partkey == p.p_partkey).select(
        "l_partkey",
        "p_name",
        "p_brand",
        F.round("p_retailprice", 2).alias("retailprice"),
    )


# ---------------------------------------------------------------------------
# P-layer: projections / filters (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@query(
    "q_project",
    oracle="SELECT l_orderkey, l_partkey FROM lineitem",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: column projection (app.py:164) — pruned at the parquet reader."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")


@query(
    "q_filter_notnull",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    """,
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3: null-dropping filter before downstream use (app.py:188, 205–206)."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("event_id", "user_id", "event_type")
    )


@query(
    "q_nested_path",
    oracle="""
    SELECT event_id,
           try_cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
    FROM events
    """,
)
def q_nested_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: nested-field extraction (app.py:143–145).

    The reference digs through nested JSON (`artists.items[0].id`); the
    fixture's nested payload is the JSON string `events.props` — extract
    `$.k` as a typed column. regexp (not a JSON extension) so the Spark
    and DuckDB expressions are literally identical.
    """
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        # try_cast: a non-matching row yields '' and ANSI cast('') throws
        F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1)
        .try_cast("bigint")
        .alias("k"),
    )


# ---------------------------------------------------------------------------
# J-layer: joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@query(
    "q_parent_inject",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
           o.o_custkey, o.o_orderdate, o.o_orderpriority
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_parent_inject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: denormalizing parent-key injection (README.md:18; app.py:185–188).

    "Inject the album_id into each track" = child LEFT JOIN parent,
    carrying parent attributes onto every child row.
    """
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return l.join(o, l.l_orderkey == o.o_orderkey, "left").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "o_custkey",
        # parquet NTZ inference makes this timestamp_ntz; normalize to the
        # session-UTC timestamp type the oracle schema declares
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )


@query(
    "q_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: semi-join membership routing (app.py:164, 205–208)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    open_orders = o.filter(F.col("o_orderstatus") == "O")
    return c.join(
        open_orders, c.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: anti-join — "parents whose enrichment never landed" (SURVEY §2.3)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# A-layer: aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@query("q_distinct", oracle="SELECT DISTINCT l_partkey FROM lineitem")
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: exact dedup by key (`set()` at app.py:164) — hash aggregate."""
    return table(spark, sf_dir, "lineitem").select("l_partkey").distinct()


@query("q_count", oracle="SELECT count(*) AS n FROM lineitem")
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: count (len() calls at app.py:165, 177, 190, 199)."""
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@query(
    "q_group_count",
    oracle="""
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-type counts — the reference's albums/tracks summary split
    (routing on item['type'], app.py:207, 216–219)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_count_distinct",
    oracle="SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 composed: exact distinct count (app.py:164→165)."""
    return table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


@query("q_approx_distinct")  # no oracle: HLL sketch values are engine-specific
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: approx_count_distinct (HLL++) — the scale path for A2.

    At 100 TB an exact countDistinct shuffles every key; the sketch is
    one pass, mergeable, O(kB) state. No DuckDB oracle (sketch values are
    engine-specific); tests/test_sketches.py bounds the error vs exact.
    """
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: hierarchical rollup (declared in scope, SURVEY §2.4)."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0), 2)    AS click,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'error'), 0), 2)    AS error,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 2) AS purchase,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'signup'), 0), 2)   AS signup,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'view'), 0), 2)     AS view
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: pivot (wide per-type metrics from the A3 routing key)."""
    e = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.sum("value"))
    )
    return piv.select(
        "user_id",
        *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t) for t in types],
    )


# ---------------------------------------------------------------------------
# L-layer: sort / limit (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


@query(
    "q_orderby",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20
    """,
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: deterministic order + limit (engine improvement over the
    reference's as_completed nondeterminism, app.py:162 etc.).

    Sort+limit lowers to TakeOrderedAndProject — per-partition top-k then
    a k-merge, never a full global sort.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# U-layer: set operations (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@query(
    "q_union",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unordered union-all (list.extend across threads, app.py:156, 163)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    return a.unionByName(b)


@query(
    "q_union_distinct",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: union + distinct (extend-then-set, app.py:153–164)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    return a.unionByName(b).distinct()


@query(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: except — declared analytics surface (SURVEY §2.7)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.subtract(o)


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: intersect."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.intersect(o)


# ---------------------------------------------------------------------------
# F-layer: scalar-function surface (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@query(
    "q_scalar_funcs",
    oracle="""
    SELECT event_id,
           concat('events/', event_type, '/', CAST(event_id AS VARCHAR), '.json') AS object_path,
           base64(CAST(event_type AS BLOB)) AS type_b64,
           round(value, 2) AS value_2dp,
           CASE WHEN event_type = 'purchase' THEN 'revenue' ELSE 'activity' END AS routing,
           coalesce(try_cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT), 0) AS k_or_zero
    FROM events
    """,
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F7/F11/F12: the reference's scalar surface in one projection.

    Path building (app.py:204–208), base64 (app.py:68), rounding
    (app.py:219), type routing (app.py:207), default-on-missing
    (app.py:143: .get(..., default)).
    """
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.concat(
            F.lit("events/"),
            F.col("event_type"),
            F.lit("/"),
            F.col("event_id").cast("string"),
            F.lit(".json"),
        ).alias("object_path"),
        F.base64(F.col("event_type").cast("binary")).alias("type_b64"),
        F.round("value", 2).alias("value_2dp"),
        F.when(F.col("event_type") == "purchase", "revenue")
        .otherwise("activity")
        .alias("routing"),
        F.coalesce(
            F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).try_cast(
                "bigint"
            ),
            F.lit(0),
        ).alias("k_or_zero"),
    )


@query(
    "q_json_roundtrip",
    oracle="""
    SELECT event_id,
           concat('{"event_id":', CAST(event_id AS VARCHAR),
                  ',"event_type":"', event_type, '"}') AS payload
    FROM events
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: JSON serialize (json.dumps, app.py:89) as a column transform.

    Spark side uses to_json(struct(...)) — the real engine primitive; the
    oracle spells out the identical canonical string. Field order and
    quoting are pinned by construction.
    """
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(F.struct(F.col("event_id"), F.col("event_type"))).alias(
            "payload"
        ),
    )


@query(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, round(value, 2) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-wins dedup: one surviving row per key by recency.

    The ingestion staple (CDC compaction, snapshot-from-log): the
    overwrite-replace of the reference (S7) generalized to incremental
    feeds. WindowGroupLimit keeps per-partition state at 1 row per key.
    """
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type", F.round("value", 2).alias("value")
        )
    )


@query(
    "q_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, round(c_acctbal * 2, 2) AS acctbal
      FROM customer WHERE c_custkey % 10 = 0
    ),
    target AS (
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer
    )
    SELECT c_custkey, c_name, acctbal, src FROM (
      SELECT u.*, 'updated' AS src FROM updates u
      UNION ALL
      SELECT t.*, 'kept' AS src FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = t.c_custkey)
    )
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert emulation: updates ∪ (target anti-join updates).

    The reference only does full replace (S7 --replace); incremental
    pipelines need keyed upsert. Without a transactional table format
    this is the canonical emulation (anti-join + union); on Delta/Iceberg
    the same logical op is MERGE INTO. The anti-join shuffles only on the
    key; the updates side broadcasts when small.
    """
    c = table(spark, sf_dir, "customer")
    target = c.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_name", F.round(F.col("c_acctbal") * 2, 2).alias("acctbal")
    )
    kept = target.join(updates, "c_custkey", "left_anti").withColumn(
        "src", F.lit("kept")
    )
    return updates.withColumn("src", F.lit("updated")).unionByName(kept)
