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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
