"""Graph operators: pure-Python references + plan-shape pins.

The oracle-parity test already hash-checks q_bfs_hops / q_pagerank
against DuckDB; these tests check the SEMANTICS against an independent
sequential implementation (so a matching-but-wrong recurrence in both
engines would still be caught) and pin the scale-critical plan shape.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from data_engineering_project_spotify_app_spark.operators import graphs, registry

registry.load_all_modules()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_list(spark):
    rows = graphs.copurchase_edges(spark, SF).collect()
    return [(r["src"], r["dst"]) for r in rows]


def test_edges_symmetric_and_loop_free(edge_list):
    s = set(edge_list)
    assert len(s) == len(edge_list), "duplicate edges"
    assert all((d, a) in s for a, d in s), "missing reverse orientation"
    assert all(a != d for a, d in s), "self-loop"


def test_bfs_matches_sequential_reference(spark, edge_list):
    adj = defaultdict(set)
    for a, d in edge_list:
        adj[a].add(d)
    parts = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey")
        .collect()
    }
    seeds = sorted(p for p in parts if p % graphs.SEED_MOD == 0)
    assert seeds, "fixture lost its seed parts"
    dist = {p: 0 for p in seeds}
    frontier = list(seeds)
    for h in range(1, graphs.MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    got = {
        r["part_key"]: r["hops"]
        for r in registry.QUERIES["q_bfs_hops"](spark, SF).collect()
    }
    assert got == dist


def test_pagerank_matches_sequential_reference(spark, edge_list):
    parts = sorted(
        r["p_partkey"]
        for r in spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey")
        .collect()
    )
    n = float(len(parts))
    out = defaultdict(list)
    for a, d in edge_list:
        out[a].append(d)
    r = {p: 1.0 / n for p in parts}
    for _ in range(graphs.PR_ITERS):
        contrib = defaultdict(float)
        for u, vs in out.items():
            share = r[u] / len(vs)
            for v in vs:
                contrib[v] += share
        r = {
            p: (1.0 - graphs.PR_DAMPING) / n
            + graphs.PR_DAMPING * contrib.get(p, 0.0)
            for p in parts
        }
    got = {
        row["part_key"]: row["rank_norm"]
        for row in registry.QUERIES["q_pagerank"](spark, SF).collect()
    }
    assert set(got) == set(parts)
    for p in parts:
        assert math.isclose(got[p], r[p] * n, abs_tol=2e-4), (
            p,
            got[p],
            r[p] * n,
        )


def test_pagerank_rank_bounds(spark):
    """Teleport floor: every node's normalized rank ≥ (1-d); isolated
    nodes sit exactly at the floor (no incoming mass)."""
    rows = registry.QUERIES["q_pagerank"](spark, SF).collect()
    floor = round(1.0 - graphs.PR_DAMPING, 4)
    assert all(r["rank_norm"] >= floor for r in rows)


def test_bfs_plan_is_one_unrolled_dag(spark):
    """The fixed-depth BFS is ONE declarative plan: every hop's
    left_anti frontier prune appears in the physical plan (no
    driver-side convergence loop materializing intermediates, and no
    per-hop checkpoints — measured slower than the bounded recompute
    at sf0.1, see bfs_hops)."""
    import io
    import contextlib

    # A persisted frame from an earlier test with an identical subplan
    # (q_item_cf's baskets == the co-purchase edge build) would be
    # substituted into this plan as InMemoryRelation — assert on a
    # clean cache (see tests/test_plans.plan_of).
    spark.catalog.clearCache()
    df = registry.QUERIES["q_bfs_hops"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("LeftAnti") >= graphs.MAX_HOPS, plan
    assert "InMemoryRelation" not in plan, plan


def test_triangle_count_matches_sequential_reference(spark, edge_list):
    adj = defaultdict(set)
    for a, d in edge_list:
        adj[a].add(d)
    ref: dict[int, int] = defaultdict(int)
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for v in (a, b, c):
                        ref[v] += 1
    got = {
        r["part_key"]: r["n_triangles"]
        for r in registry.QUERIES["q_triangle_count"](spark, SF).collect()
    }
    assert got == dict(ref)
    assert got, "fixture graph has no triangles — test is vacuous"


def test_markov_transitions_match_sequential_reference(spark):
    from data_engineering_project_spotify_app_spark.tables import table

    # read via tables.table so the reference sees the same µs-truncated
    # timestamps the operator computes on (raw NANOS would order
    # sub-microsecond ties differently)
    rows = (
        table(spark, SF, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts: dict[tuple, int] = defaultdict(int)
    for evs in by_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), n in counts.items():
        totals[a] += n
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in registry.QUERIES["q_markov_transitions"](spark, SF).collect()
    }
    assert set(got) == set(counts)
    for k, n in counts.items():
        assert got[k][0] == n
        assert got[k][1] == round(n / totals[k[0]], 4)


def test_markov_rows_sum_to_one(spark):
    rows = registry.QUERIES["q_markov_transitions"](spark, SF).collect()
    by_from = defaultdict(float)
    for r in rows:
        by_from[r["from_type"]] += r["p"]
    for v in by_from.values():
        assert abs(v - 1.0) < 1e-3


def test_triangle_plan_is_edge_iterator(spark):
    """The counting step must be the codegen array_intersect over
    adjacency arrays, never a join over materialized wedges (the
    wedge-join form shuffled Σ C(outdeg,2) rows — measured 2.4× slower
    at sf0.1), and the multi-consumer oriented adjacency must come from
    the shared AT-REST landing (both scans of the plan read the
    oriented_adjacency table; no degree/orientation join subtree is
    rebuilt inside the query)."""
    import io
    import contextlib

    df = registry.QUERIES["q_triangle_count"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "array_intersect" in plan, plan
    assert "oriented_adjacency_" in plan, plan
    # the adjacency index is consumed, not rebuilt: no orientation
    # machinery (degree count_distinct) survives in this plan
    assert "count_distinct" not in plan.lower(), plan


def test_clustering_coefficient_identities(spark):
    """3*triangles <= wedges (every triangle closes 3 wedges, each
    wedge closes at most once), and the coefficient reconciles with
    the registered per-node triangle counts."""
    from data_engineering_project_spotify_app_spark.operators import registry

    r = registry.QUERIES["q_clustering_coefficient"](spark, SF).collect()[0]
    assert 0 <= r["clustering_coefficient"] <= 1
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    tri_rows = registry.QUERIES["q_triangle_count"](spark, SF).collect()
    assert sum(x["n_triangles"] for x in tri_rows) == 3 * r["n_triangles"]


def test_assortativity_in_range(spark):
    from data_engineering_project_spotify_app_spark.operators import registry

    r = registry.QUERIES["q_assortativity"](spark, SF).collect()[0]
    assert -1 - 1e-9 <= r["assortativity"] <= 1 + 1e-9
    assert r["n_edges"] > 0
