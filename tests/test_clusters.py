"""Unit tests for the connected-components primitive (clusters.py).

The oracle-parity suite exercises q_dedup_clusters end-to-end, but the
LSH fixture graphs are stars/cliques that converge in one round — these
tests force the shapes the loop exists for: long paths (multi-round
pointer doubling) and edge-free graphs (the subgraph restriction's
boundary case).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.clusters import connected_components


def _cc(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "node bigint")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "src bigint, dst bigint"
    )
    if not edges:
        e = e.filter(F.lit(False))
    out = connected_components(n, e)
    return {r["node"]: r["lbl"] for r in out.collect()}


def test_path_graph_needs_doubling(spark):
    # 0-1-2-...-9 single path: naive propagation needs 9 rounds,
    # doubling needs ~log2(9) — either way every node must reach lbl 0
    got = _cc(spark, range(10), [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_singletons(spark):
    got = _cc(spark, range(7), [(1, 2), (2, 3), (5, 6)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_no_edges_all_selfloops(spark):
    got = _cc(spark, range(5), [])
    assert got == {i: i for i in range(5)}


def test_edge_orientation_irrelevant(spark):
    # edges given in mixed orientation; min label still propagates
    got = _cc(spark, range(4), [(3, 2), (1, 2), (0, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}
