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


def test_incremental_join_invariant(spark, sf_dir):
    """IVM correctness: (A_old ⋈ B_old) ∪ ΔV == (A∪ΔA) ⋈ (B∪ΔB), and
    the three delta terms partition ΔV (disjoint, no overlap)."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.incremental import (
        _C_BAND,
        _DELTA_BAND,
        _O_BAND,
        q_incremental_join,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    delta = q_incremental_join(spark, sf_dir)
    # terms partition: no (orderkey, custkey) appears under two terms
    dup = (
        delta.groupBy("o_orderkey", "c_custkey")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey")
    full = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    o_band = F.expr(_O_BAND.format(s="STRING"))
    c_band = F.expr(_C_BAND.format(s="STRING"))
    old_view = (
        o.filter(o_band >= _DELTA_BAND)
        .join(
            c.filter(c_band >= _DELTA_BAND),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_custkey")
    )
    rebuilt = old_view.unionByName(delta.select("o_orderkey", "c_custkey"))
    assert rebuilt.count() == full.count()
    assert rebuilt.exceptAll(full).count() == 0
    assert full.exceptAll(rebuilt).count() == 0
