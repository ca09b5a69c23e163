"""Incremental aggregate maintenance: split-point invariance.

Oracle parity (merge == full recompute at the registered cutover) runs
in test_oracle_parity.py; here the same equality is asserted for OTHER
split points — the property that makes the maintenance loop sound for
any increment schedule — and for the degenerate splits (empty base /
empty delta).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators import incremental
from data_engineering_project_spotify_app_spark.tables import table
from tests.conftest import SF_SMOKE


def _rollup_at(spark, cutover: str):
    e = table(spark, SF_SMOKE, "events")
    cut = F.lit(cutover).cast("timestamp")
    base = incremental._partials(e.filter(F.col("ts") < cut))
    delta = incremental._partials(e.filter(F.col("ts") >= cut))
    merged = incremental.merge_partials(base, delta)
    return sorted(tuple(r) for r in merged.collect())


@pytest.mark.parametrize(
    "cutover",
    ["2023-01-01", "2024-01-05", "2024-01-20", "2030-01-01"],
)
def test_merge_invariant_to_split_point(spark, cutover):
    """Any (base, delta) split — including empty base and empty delta —
    merges to the same state."""
    assert _rollup_at(spark, cutover) == _rollup_at(
        spark, incremental.CUTOVER
    )
