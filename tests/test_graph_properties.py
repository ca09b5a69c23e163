"""Property-based graph-operator invariants (hypothesis).

The fixture-level tests (test_graphs.py) check one graph; these run the
DataFrame-level operators on hypothesis-generated random graphs against
sequential references, so shape assumptions (dense/sparse, isolated
nodes, disconnected components, degree ties) are all exercised.
"""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import given, settings, strategies as st

from data_engineering_project_spotify_app_spark.operators.graphs import (
    bfs_hops,
    pagerank,
    triangle_counts,
)

N_NODES = 8

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_NODES - 1),
        st.integers(min_value=0, max_value=N_NODES - 1),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=24,
)

_SETTINGS = {"max_examples": 8, "deadline": None, "derandomize": True}


def _sym(pairs):
    """Both-direction distinct edge set (the operators' input contract)."""
    s = set()
    for a, b in pairs:
        s.add((a, b))
        s.add((b, a))
    return sorted(s)


def _edge_df(spark, sym):
    if not sym:
        return spark.createDataFrame([], "src bigint, dst bigint")
    return spark.createDataFrame(sym, "src bigint, dst bigint")


@given(pairs=_edges)
@settings(**_SETTINGS)
def test_triangle_counts_random_graphs(spark, pairs):
    sym = _sym(pairs)
    adj = defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    ref: dict[int, int] = defaultdict(int)
    for a in sorted(adj):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for v in (a, b, c):
                        ref[v] += 1
    got = {
        r["part_key"]: r["n_triangles"]
        for r in triangle_counts(_edge_df(spark, sym)).collect()
    }
    assert got == dict(ref)


@given(pairs=_edges)
@settings(**_SETTINGS)
def test_bfs_hops_random_graphs(spark, pairs):
    sym = _sym(pairs)
    adj = defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    seeds = [n for n in range(N_NODES) if n % 3 == 0]
    max_hops = 3
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    seeds_df = spark.createDataFrame(
        [(s,) for s in seeds], "part bigint"
    )
    got = {
        r["part_key"]: r["hops"]
        for r in bfs_hops(seeds_df, _edge_df(spark, sym), max_hops).collect()
    }
    assert got == dist


def test_bfs_hops_deep_pinned_path(spark):
    """Depth past BFS_PIN_DEPTH takes the per-hop pinned branch (the
    2^h-lineage guard, VERDICT r14 item 7): results must match the
    sequential reference exactly, and the rule must actually fire."""
    from data_engineering_project_spotify_app_spark.operators.graphs import (
        BFS_PIN_DEPTH,
    )
    from data_engineering_project_spotify_app_spark.operators import pinutil

    # a 12-node path graph: seeds at one end force max-depth discovery
    edges = [(i, i + 1) for i in range(11)]
    sym = edges + [(b, a) for a, b in edges]
    max_hops = BFS_PIN_DEPTH + 3
    adj = defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    dist = {0: 0}
    frontier = [0]
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    seeds_df = spark.createDataFrame([(0,)], "part bigint")
    observed: list = []
    pinutil.PIN_OBSERVERS.append(observed.append)
    try:
        got = {
            r["part_key"]: r["hops"]
            for r in bfs_hops(
                seeds_df, _edge_df(spark, sym), max_hops
            ).collect()
        }
    finally:
        pinutil.PIN_OBSERVERS.remove(observed.append)
    assert got == dist
    # one pin per non-final hop — the depth-conditional rule fired
    assert len(observed) == max_hops - 1


@given(pairs=_edges)
@settings(**_SETTINGS)
def test_pagerank_random_graphs(spark, pairs):
    sym = _sym(pairs)
    out = defaultdict(list)
    for a, b in sym:
        out[a].append(b)
    nodes = list(range(N_NODES))
    n = float(len(nodes))
    iters, damping = 4, 0.85
    r = {p: 1.0 / n for p in nodes}
    for _ in range(iters):
        contrib = defaultdict(float)
        for u, vs in out.items():
            share = r[u] / len(vs)
            for v in vs:
                contrib[v] += share
        r = {
            p: (1.0 - damping) / n + damping * contrib.get(p, 0.0)
            for p in nodes
        }
    nodes_df = spark.createDataFrame([(p,) for p in nodes], "part bigint")
    got = {
        row["part_key"]: row["rank_norm"]
        for row in pagerank(
            nodes_df, _edge_df(spark, sym), iters, damping
        ).collect()
    }
    assert set(got) == set(nodes)
    for p in nodes:
        assert math.isclose(got[p], r[p] * n, abs_tol=2e-4), (p, got[p], r[p] * n)
