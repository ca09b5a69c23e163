"""Plan pins for the round-6 continuation operators (100 TB posture)."""

from __future__ import annotations

import pytest

from tests.test_plans import plan_of, plan_with_pins, pushed_filters


def test_revenue_bridge_pushdown_and_broadcast(spark, sf_dir):
    """The shipdate range predicate must reach the parquet scan (it is
    written against the raw column, not year()), and the part dim join
    must broadcast. The brand×year panel is pinned (two pivot
    consumers), so the scan+join lineage is asserted on the captured
    pre-pin plan."""
    plan, pins = plan_with_pins(spark, sf_dir, "q_revenue_bridge")
    full = plan + "".join(pins)
    pushed = pushed_filters(full)
    assert any("l_shipdate" in p for p in pushed), full
    assert "BroadcastHashJoin" in full, full


@pytest.mark.parametrize(
    "name",
    [
        "q_association_rules",
        "q_audience_overlap",
        "q_degree_histogram",
        "q_attribution",
        "q_cdc_apply",
    ],
)
def test_affinity_family_no_sort_merge_join(spark, sf_dir, name):
    """Every join in these plans is either a broadcast of a tiny
    aggregate or nonexistent (in-plan pair generation / fold) — a
    SortMergeJoin would mean a fact-sized side got shuffled for a
    |brands|/|types|-sized frame."""
    plan = plan_of(spark, sf_dir, name)
    assert "SortMergeJoin" not in plan, plan


def test_quantile_normalize_rank_is_two_phase(spark, sf_dir):
    """Both global rankings inside q_quantile_normalize must be the
    two-phase range-partitioned form; the only unpartitioned windows
    run over per-range count frames (rankutil.py contract). The range
    exchange sits behind rankutil's checkpoint boundary since the r13
    execution-consistency fix (visible as Scan ExistingRDD;
    rangepartitioning itself is pinned on ranged_by in
    test_plans.py). Both ranked frames are additionally pinned (each
    has two consumers), so the pid windows show in the captured
    pre-pin plans."""
    plan, pins = plan_with_pins(spark, sf_dir, "q_quantile_normalize")
    full = plan + "".join(pins)
    assert "Scan ExistingRDD" in plan, plan
    assert "windowspecdefinition(pid#" in full, full


def test_covariance_and_quantize_have_no_data_shuffle(spark, sf_dir):
    """The moment/stat passes shuffle only O(d²)/O(d) partial rows:
    no Exchange may carry the embedding column itself."""
    for name in ["q_embedding_covariance", "q_embedding_quantize"]:
        plan = plan_of(spark, sf_dir, name)
        for block in plan.split("\n\n"):
            if "Exchange" in block and "embedding" in block:
                raise AssertionError(
                    f"{name}: an Exchange carries the embedding column\n{plan}"
                )


def test_multimodal_dedup_shuffles_digests_only(spark, sf_dir):
    """The blob bytes must stay in the scan stage: the aggregate
    exchange carries the 32-byte digest, never the payload column."""
    plan = plan_of(spark, sf_dir, "q_multimodal_dedup")
    import re

    for m in re.finditer(r"\(\d+\) Exchange[\s\S]*?(?=\n\(\d+\)|\Z)", plan):
        # the binary column is `payload#N`; `payload_sha256#N` is the digest
        assert not re.search(r"payload#\d", m.group(0)), plan


def test_level_shift_and_rolling_median_preaggregate(spark, sf_dir):
    """The per-type ordered windows must consume the |types|×|days|
    daily aggregate, not raw events: a HashAggregate appears BELOW the
    Window in the plan tree."""
    for name in ["q_level_shift", "q_rolling_median"]:
        plan = plan_of(spark, sf_dir, name)
        tree = plan.split("\n(1)")[0]
        win = tree.find("Window")
        agg = tree.rfind("HashAggregate")
        assert win != -1 and agg != -1 and agg > win, (name, tree)


@pytest.mark.parametrize(
    "name", ["q_item_cf", "q_clustering_coefficient"]
)
def test_heavy_graph_cf_plans_never_sort_merge_join(spark, sf_dir, name):
    """The two most expensive bench queries: q_item_cf's round-6 win
    (5.3→4.2 s) was broadcasting the item-frequency frames instead of
    shuffle-joining them against the pair fanout, and the clustering-
    coefficient composition inherits the triangle machinery's broadcast
    posture. A SortMergeJoin reappearing in either plan means a
    fact-sized side silently lost its broadcast — the regression this
    pin catches."""
    plan = plan_of(spark, sf_dir, name)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
