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


_CDC_ORACLE = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type, value FROM events
    ),
    last_err AS (
      SELECT user_id, max(row(ts, event_id)) AS le
      FROM e WHERE event_type = 'error' GROUP BY 1
    ),
    live AS (
      SELECT e.user_id, e.ts, e.event_id, e.value
      FROM e LEFT JOIN last_err x ON x.user_id = e.user_id
      WHERE e.event_type <> 'error'
        AND (x.le IS NULL OR row(e.ts, e.event_id) > x.le)
    )
    SELECT user_id,
           round(sum(value), 4) AS balance,
           CAST(count(*) AS BIGINT) AS n_ops,
           max(ts) AS last_ts
    FROM live GROUP BY 1
    """


@query("q_cdc_apply", oracle=_CDC_ORACLE)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-log apply with tombstones: fold each user's ordered
    event log into final state — non-error events accumulate into the
    balance; an 'error' event is a TOMBSTONE that wipes the user's
    state (everything before it is dead). Users whose log ends in a
    wipe (no live events after the last tombstone) do not appear —
    exactly a compacted changelog topic's read view (insert/update =
    upsert, error = delete marker).

    Same single-shuffle fold as q_funnel (funnel.py): ONE
    groupBy(user_id) collect of (ts, event_id, type, value), sorted in
    codegen, folded with the ``aggregate`` HOF — no self-join against
    a "last tombstone" subquery, no second pass. The (ts, event_id)
    composite sort key is a strict total order, so the fold (and the
    oracle's row()-comparison formulation) see the same log order
    under timestamp ties. Per-user log must fit a task — bounded in
    any real CDC window (the funnel.py scale note).
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    logs = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value"))
        ).alias("log")
    )
    acc0 = F.struct(
        F.lit(0.0).alias("bal"),
        F.lit(0).cast("bigint").alias("n"),
        F.lit(None).cast("timestamp").alias("last_ts"),
    )

    def step(acc, x):
        is_tomb = x["event_type"] == F.lit("error")
        return F.struct(
            F.when(is_tomb, F.lit(0.0))
            # coalesce matches SQL SUM's null-skipping: a NULL value must
            # not poison the running balance (fixture has none; guard
            # anyway so the fold and the oracle agree on any input)
            .otherwise(acc["bal"] + F.coalesce(x["value"], F.lit(0.0)))
            .alias("bal"),
            F.when(is_tomb, F.lit(0).cast("bigint"))
            .otherwise(acc["n"] + 1)
            .alias("n"),
            F.when(is_tomb, F.lit(None).cast("timestamp"))
            .otherwise(x["ts"])
            .alias("last_ts"),
        )

    folded = logs.select(
        "user_id", F.aggregate("log", acc0, step).alias("st")
    )
    return folded.filter(F.col("st.n") > 0).select(
        "user_id",
        F.round("st.bal", 4).alias("balance"),
        F.col("st.n").alias("n_ops"),
        F.col("st.last_ts").alias("last_ts"),
    )


# First-md5-hex-digit bands: digits 0-1 of 16 => ~1/8 of keys are "delta".
_DELTA_BAND = 2
_O_BAND = (
    "(instr('0123456789abcdef', "
    "substr(md5(CAST(o_orderkey AS {s})), 1, 1)) - 1)"
)
_C_BAND = (
    "(instr('0123456789abcdef', "
    "substr(md5(CAST(c_custkey AS {s})), 1, 1)) - 1)"
)


_IVM_ORACLE = f"""
    WITH o_old AS (
      SELECT * FROM orders WHERE {_O_BAND.format(s='VARCHAR')} >= {_DELTA_BAND}
    ),
    o_new AS (
      SELECT * FROM orders WHERE {_O_BAND.format(s='VARCHAR')} < {_DELTA_BAND}
    ),
    c_old AS (
      SELECT * FROM customer WHERE {_C_BAND.format(s='VARCHAR')} >= {_DELTA_BAND}
    ),
    c_new AS (
      SELECT * FROM customer WHERE {_C_BAND.format(s='VARCHAR')} < {_DELTA_BAND}
    )
    SELECT o.o_orderkey, c.c_custkey, 'dA_B' AS term,
           round(o.o_totalprice, 2) AS totalprice
    FROM o_new o JOIN c_old c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT o.o_orderkey, c.c_custkey, 'A_dB', round(o.o_totalprice, 2)
    FROM o_old o JOIN c_new c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT o.o_orderkey, c.c_custkey, 'dA_dB', round(o.o_totalprice, 2)
    FROM o_new o JOIN c_new c ON c.c_custkey = o.o_custkey
    """


@query("q_incremental_join", oracle=_IVM_ORACLE)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN: the delta of
    V = A ⋈ B under inserts ΔA, ΔB is EXACTLY
    ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB) — the classic join-delta
    algebra (Blakeley et al., SIGMOD'86) that lets a materialized
    orders⋈customer view refresh with O(|Δ|·avg-fanout) work instead
    of recomputing |A∪ΔA| ⋈ |B∪ΔB|. Emitted rows carry their algebra
    term as provenance. Deltas are deterministic md5 key-bands (the
    q_dataset_split idiom) so both engines see identical snapshots;
    tests pin the invariant old-view ∪ ΔV == full-view.

    Scale: every term joins a DELTA side — ~1/8 of one input — so the
    small side broadcasts (hinted for ΔB; AQE sizes ΔA's joins), and
    the base relations are only ever scanned, never shuffled twice.
    At 100 TB the base sides would be bucketed on the join key
    (sources/bucketed.py), making the big-side scans exchange-free.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o_band = F.expr(_O_BAND.format(s="STRING"))
    c_band = F.expr(_C_BAND.format(s="STRING"))
    # The md5 band predicate cannot push down to parquet, so every
    # delta consumer re-read the full base table and re-hashed it; the
    # ΔA / ΔB sides are each consumed by TWO algebra terms. Pin the
    # two delta frames (~1/8 of an input each) so the base tables are
    # hashed once per side (guide §2.4); the two -old sides have one
    # consumer each and stay plain scans.
    o_old, o_new = o.filter(o_band >= _DELTA_BAND), o.filter(
        o_band < _DELTA_BAND
    ).localCheckpoint(eager=False)
    c_old, c_new = c.filter(c_band >= _DELTA_BAND), c.filter(
        c_band < _DELTA_BAND
    ).localCheckpoint(eager=False)

    def term(odf: DataFrame, cdf: DataFrame, tag: str, bc) -> DataFrame:
        cside = F.broadcast(cdf) if bc else cdf
        return odf.join(
            cside, odf.o_custkey == cdf.c_custkey
        ).select(
            "o_orderkey",
            "c_custkey",
            F.lit(tag).alias("term"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )

    return (
        term(o_new, c_old, "dA_B", bc=False)
        .unionByName(term(o_old, c_new, "A_dB", bc=True))
        .unionByName(term(o_new, c_new, "dA_dB", bc=True))
    )
