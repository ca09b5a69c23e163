"""Scale-technique operators: the claims the oracle can't check.

Oracle parity (exact results) runs in test_oracle_parity.py; these tests
assert the *plan* and *layout* properties that make the techniques worth
using at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators import scale_ops
from data_engineering_project_spotify_app_spark.tables import table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_interval_join_is_hash_not_nested_loop(spark):
    """The banded rewrite must plan as an equi-join, never a nested loop.

    (A naive df.join(df2, abs(a-b) <= W) theta join plans as
    BroadcastNestedLoopJoin — O(N·M) work and a broadcast of a
    potentially huge side.)
    """
    plan = _plan(scale_ops.q_interval_join(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_interval_join_matches_naive_theta(spark):
    """Bucket + exact-filter equals the naive theta join (tiny SF)."""
    ev = table(spark, SF_SMOKE, "events")
    sec = F.col("ts").cast("double")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", sec.alias("c_sec")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        sec.alias("e_sec")
    )
    naive = (
        clicks.join(
            errors,
            F.abs(F.col("c_sec") - F.col("e_sec")) <= scale_ops.BAND_SECONDS,
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_nearby_errors"))
    )
    a = sorted(tuple(r) for r in naive.collect())
    b = sorted(
        tuple(r) for r in scale_ops.q_interval_join(spark, SF_SMOKE).collect()
    )
    assert a == b


def test_zorder_buckets_prune_both_dimensions(spark):
    """Z-layout bounds BOTH dimensions per bucket; a single-column sort
    bounds only its own.

    Metric: the mean per-bucket range *fraction* of each dimension
    (bucket min-max span / global span) — the fraction of buckets a
    point predicate on that column fails to prune. A single-column sort
    leaves the other dimension's fraction near 1 (no pruning); the
    z-layout must keep the WORSE of its two fractions well under that.
    """
    from pyspark.sql.window import Window

    o = table(spark, SF_SMOKE, "orders").select(
        "o_custkey",
        (F.col("o_orderdate").cast("timestamp").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    )
    stats = o.agg(
        F.min("o_custkey").alias("cmin"),
        F.max("o_custkey").alias("cmax"),
        F.min("day").alias("dmin"),
        F.max("day").alias("dmax"),
    )
    zmax = (1 << scale_ops.Z_BITS) - 1
    norm = o.crossJoin(F.broadcast(stats)).select(
        "o_custkey",
        "day",
        F.floor(
            (F.col("o_custkey") - F.col("cmin"))
            * zmax
            / F.greatest(F.col("cmax") - F.col("cmin"), F.lit(1))
        ).alias("cn"),
        F.floor(
            (F.col("day") - F.col("dmin"))
            * zmax
            / F.greatest(F.col("dmax") - F.col("dmin"), F.lit(1))
        ).alias("dn"),
    )
    z = norm.select("o_custkey", "day", F.expr(scale_ops._ZVAL).alias("zkey"))
    n_buckets = 16
    cspan, dspan = (
        z.agg(
            (F.max("o_custkey") - F.min("o_custkey") + 1),
            (F.max("day") - F.min("day") + 1),
        ).collect()[0]
    )

    def fractions(key):
        ranked = z.withColumn(
            "bucket", F.ntile(n_buckets).over(Window.orderBy(key))
        )
        row = (
            ranked.groupBy("bucket")
            .agg(
                ((F.max("o_custkey") - F.min("o_custkey") + 1) / cspan).alias(
                    "cf"
                ),
                ((F.max("day") - F.min("day") + 1) / dspan).alias("df"),
            )
            .agg(F.avg("cf"), F.avg("df"))
            .collect()[0]
        )
        return row[0], row[1]

    z_cf, z_df = fractions("zkey")
    c_cf, c_df = fractions("o_custkey")
    d_cf, d_df = fractions("day")
    # single-column sorts leave the other dimension unpruned (~full span)
    assert c_df > 0.8 and d_cf > 0.8, (c_df, d_cf)
    # the z-layout prunes BOTH dimensions: its worse fraction stays far
    # below the single-sorts' unpruned dimension
    assert max(z_cf, z_df) < 0.5, (z_cf, z_df)


def test_runtime_bloom_filter_injection(spark, tmp_path):
    """Spark's runtime bloom filter must fire on a selective-dim join.

    At 100 TB the injected filter prunes fact rows BEFORE the shuffle —
    the engine's posture is to rely on the built-in InjectRuntimeFilter
    rule rather than hand-rolling sketches; this test proves the rule
    actually fires under our session confs (it needs a shuffle join and
    a creation-side under the size thresholds).
    """
    li = table(spark, SF_SMOKE, "lineitem")
    od = table(spark, SF_SMOKE, "orders")
    li.write.mode("overwrite").parquet(str(tmp_path / "li"))
    od.write.mode("overwrite").parquet(str(tmp_path / "od"))
    li2 = spark.read.parquet(str(tmp_path / "li"))
    od2 = spark.read.parquet(str(tmp_path / "od"))

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtimeFilter.number.threshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    try:
        joined = li2.join(
            od2.filter(F.col("o_orderpriority") == "1-URGENT"),
            li2.l_orderkey == od2.o_orderkey,
        ).agg(F.sum("l_extendedprice").alias("s"))
        plan = _plan(joined)
        assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, plan[
            :2000
        ]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_prune_matches_sequential_reference(spark):
    """Filter contents and every per-order verdict recomputed in pure
    Python (hashlib md5, same slice/mod arithmetic) — the exact
    false-positive SET must match, and false negatives are impossible."""
    import hashlib

    from data_engineering_project_spotify_app_spark.operators import (
        registry,
        scale_ops as so,
    )

    registry.load_all_modules()
    sf = "/root/testdata/sf0.001"

    def bits(key: int) -> list[int]:
        h = hashlib.md5(str(key).encode()).hexdigest()
        return [
            int(h[s - 1 : s + 7], 16) % so.BLOOM_NBITS for s in (1, 9, 17)
        ]

    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    ).collect()
    hv = {r["c_custkey"] for r in cust if r["c_acctbal"] > so.BLOOM_ACCTBAL}
    words = [0] * so.BLOOM_WORDS
    for k in hv:
        for b in bits(k):
            words[b // so.BLOOM_WORD_BITS] |= 1 << (b % so.BLOOM_WORD_BITS)
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).collect()
    from collections import Counter

    expect = Counter()
    for r in orders:
        ok = all(
            words[b // so.BLOOM_WORD_BITS] >> (b % so.BLOOM_WORD_BITS) & 1
            for b in bits(r["o_custkey"])
        )
        member = r["o_custkey"] in hv
        if not ok and not member:
            expect["pruned"] += 1
        elif ok and member:
            expect["hit"] += 1
        elif ok:
            expect["false_positive"] += 1
        else:
            expect["missed"] += 1
    got = {
        r["outcome"]: r["n_orders"]
        for r in registry.QUERIES["q_bloom_prune"](spark, sf).collect()
    }
    assert got == dict(expect)
    assert "missed" not in got, "Bloom filters cannot have false negatives"


def test_bloom_build_side_broadcasts(spark):
    from data_engineering_project_spotify_app_spark.operators import registry
    from tests.test_plans import plan_of

    registry.load_all_modules()
    plan = plan_of(spark, "/root/testdata/sf0.001", "q_bloom_prune")
    assert "BroadcastHashJoin" in plan, plan


def test_selfjoin_skew_flags_hot_key_and_sums_to_join_size(spark):
    """Σ contrib over ALL keys == exact self-join row count, and a key
    owning > the share threshold is flagged while the tail is not."""
    from data_engineering_project_spotify_app_spark.operators.scale_ops import (
        selfjoin_skew,
    )

    rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, ["key_col"])
    out = {r["key"]: r for r in selfjoin_skew(df, "key_col", 30, 40).collect()}
    exact = df.alias("a").join(df.alias("b"), "key_col").count()
    assert sum(r["contrib"] for r in out.values()) == exact
    assert out["hot"]["skewed"] is True  # 6400/6420 ≈ 99.7% > 40%
    assert all(not r["skewed"] for k, r in out.items() if k != "hot")


def test_selfjoin_skew_plan_is_topk(spark):
    from data_engineering_project_spotify_app_spark.operators import registry
    from tests.test_plans import plan_of

    registry.load_all_modules()
    plan = plan_of(spark, "/root/testdata/sf0.001", "q_selfjoin_skew")
    assert "TakeOrderedAndProject" in plan, plan
