"""Bucketed managed-table landings — co-located joins at 100 TB.

The engine's big-join story has three rungs: broadcast (small dim),
AQE-decided shuffle join (default), and THIS — bucketing, for the
fact-to-fact joins that recur on the same key (orders ⋈ lineitem on
the order key, events sessionization by user, dedup probes by digest).
Landing both tables bucketed by the join key with the same bucket
count pays the partitioning shuffle ONCE at write time; every
subsequent equi-join (and groupBy) on that key reads co-located
buckets and skips its Exchange entirely — asserted on the executed
plan in tests/test_bucketed.py, not taken on faith.

This is the Spark-native replacement for the reference's "one object
per key" staging layout (app.py:204–208): where the reference made
per-key addressing the storage contract, a bucketed table makes
per-key CO-LOCATION the contract and leaves addressing to the format.

Scale notes:
- bucket count is fixed at write time: size it to the TARGET corpus
  (buckets ≈ data_size / desired_task_size), not the current one —
  at 100 TB with 512 MB tasks that's ~200k buckets; local tests use
  small counts. Too few buckets = giant tasks; AQE cannot split a
  skewed BUCKET join (skew-join splitting only applies to shuffle
  joins), so a hot key still needs salting upstream of the landing.
- ``sortBy`` the bucket key so single-file buckets need no re-sort
  before a sort-merge join; Spark still inserts a Sort when a bucket
  has several files — land with one write (no appends) to keep the
  one-file-per-bucket invariant.
- Both sides must use the SAME bucket count; a mismatch silently
  falls back to a shuffled join (the parity test pins the matched
  case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def land_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Land ``df`` as a managed parquet table bucketed (and sorted) on
    ``bucket_col`` — the pay-the-shuffle-once write.

    One writer job per landing (mode=overwrite): appends would add a
    second file per bucket and reintroduce the pre-join Sort. The
    pre-write ``repartition(n_buckets, bucket_col)`` uses the same
    murmur3-pmod hash as the bucket spec, so each write task holds
    exactly one bucket's rows → ONE file per bucket — the invariant
    Spark's scan needs to trust ``sortBy`` order and elide the
    sort-merge join's per-side Sort (asserted in tests).
    """
    (
        df.repartition(n_buckets, bucket_col)
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed landed tables on their bucket key.

    With matching bucket counts the physical plan is a sort-merge join
    with NO Exchange on either side (each task merges bucket i of both
    tables in place). The join is deliberately un-hinted: if one side
    is small, AQE may still choose broadcast — also exchange-free.
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)


def drop_landed(spark: SparkSession, *table_names: str) -> None:
    """Drop managed landings (test hygiene / TTL'd staging parity)."""
    for name in table_names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# ---------------------------------------------------------------------------
# Shared derive-once landings
#
# Several operator families consume the same derived frame (co-purchase
# edges, part baskets, minhash/simhash signatures, word bigrams); Spark
# shares no subplans across separate query executions, so each consumer
# used to re-pay the derivation. landed_frame() lands a derivation ONCE
# per (prefix, corpus) as a bucketed managed table and hands every later
# consumer a table scan.
#
# Contract:
# - The memo is PROCESS-LOCAL on purpose: a managed table left by a
#   previous process may be stale against regenerated testdata, so the
#   first consumer in each process re-lands (mode=overwrite) rather than
#   trust the catalog (pinned in tests/test_landings.py).
# - Within a process the landing is immutable: regenerating the corpus
#   at the SAME sf_dir mid-process is unsupported — call
#   invalidate_landings() (or restart) after rewriting testdata.
# - Single-writer: two processes sharing one warehouse dir must not
#   land the same (prefix, sf_dir) concurrently (same md5-derived table
#   name; an overwrite can race another process's read). The bench /
#   driver / test flows are all single-process per warehouse.
# - Constructing a query DataFrame that consumes a landing triggers the
#   one-time write as a side effect (plan-only callers pay it once per
#   process; it is what makes the plan a bucketed table scan at all).
# ---------------------------------------------------------------------------

from collections.abc import Callable  # noqa: E402

_LANDED: dict[tuple[str, str], str] = {}


def landed_frame(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    bucket_col: str,
    n_buckets: int,
    build: Callable[[], DataFrame],
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """The derive-once landing: on first use per (prefix, sf_dir) in
    this process, land ``build()`` via land_bucketed under a
    corpus-digested table name; afterwards return the table."""
    import hashlib

    key = (prefix, sf_dir)
    name = _LANDED.get(key)
    if name is None:
        digest = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        name = f"{prefix}_{digest}"
        land_bucketed(build(), name, bucket_col, n_buckets, sort_cols)
        _LANDED[key] = name
    return spark.table(name)


def invalidate_landings(sf_dir: str | None = None) -> None:
    """Forget this process's landing memos (all, or one corpus) so the
    next consumer re-lands — required after regenerating testdata at an
    sf_dir this process has already landed."""
    if sf_dir is None:
        _LANDED.clear()
    else:
        for key in [k for k in _LANDED if k[1] == sf_dir]:
            del _LANDED[key]
