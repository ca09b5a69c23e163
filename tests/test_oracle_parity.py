"""Oracle-differential tests: every oracle-backed query vs DuckDB.

This is the local twin of the driver's t2 correctness gate — one
parametrized test per registered query that has an oracle.
"""

from __future__ import annotations

import pytest

from data_engineering_project_spotify_app_spark.operators import registry
from tests.oracle_harness import compare

registry.load_all_modules()

ORACLE_NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, sf_dir, name, registry.QUERIES[name], registry.ORACLES[name])


def test_every_query_runs(spark, sf_dir):
    """Rows-only queries (no oracle) at least execute and have stable schema."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


@pytest.mark.parametrize(
    "name",
    [
        "q_lorenz_curve",
        "q_abc_classification",
        "q_pack_shards",
        "q_ntile",
        "q_skyline",
    ],
)
def test_two_phase_cumulatives_partitioning_invariant(spark, sf_dir, name):
    """Regression pin for the r13 invariance-sweep catch: the two-phase
    cumulative operators must hash-match their oracles with AQE OFF and
    an odd shuffle-partition count IN THE SAME SESSION. The broken form
    consumed a randomly-sampled range exchange from two subtrees
    (per-range offsets vs local windows) and silently misaligned the
    cumulative sums whenever the planner did not reuse the exchange —
    q_lorenz_curve's decile shares shifted with the partition count.
    Fixed by closed-form ntile buckets (lorenz/abc) and by pinning one
    execution behind a lazy localCheckpoint (rankutil, pack_shards)."""
    before = {
        "spark.sql.adaptive.enabled": spark.conf.get(
            "spark.sql.adaptive.enabled"
        ),
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        compare(
            spark, sf_dir, name, registry.QUERIES[name],
            registry.ORACLES[name],
        )
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
