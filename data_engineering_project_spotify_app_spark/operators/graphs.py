"""Iterative graph operators over a derived co-purchase graph.

The reference's data model has no explicit graph, but every large-scale
pipeline grows one (link graphs for dedup provenance, co-occurrence
graphs for curation); these operators derive a part co-purchase graph
from ``lineitem`` (two parts are adjacent iff some order contains both)
and run the two canonical iterative algorithms over it:

- ``q_bfs_hops`` — multi-source BFS (min hops from seed parts, bounded
  depth). Integer-exact, so the DuckDB oracle is a recursive CTE and
  the comparison is a full value-hash.
- ``q_pagerank`` — fixed-iteration power iteration (damping 0.85,
  5 iterations, uniform init). The oracle unrolls the same five steps
  as nested CTEs; both engines round the final mean-normalized rank to
  4 decimals (cross-engine summation order differs in the last ulp —
  the registry-wide double discipline).

Scale design (100 TB posture):

- Edge derivation is a lineitem self-join co-partitioned on
  ``l_orderkey`` (ONE shuffle per side); per-order pair fanout is
  bounded by order size (≤ 7 lines in TPC-H-shaped data), so no task
  can explode regardless of corpus size.
- BFS expands the FRONTIER only (newly-reached nodes, via left_anti
  against the visited set), never the whole reached set — re-expansion
  is the classic BFS-at-scale mistake. Depth is a fixed constant, so
  the loop is plan-unrolled with zero driver-side actions.
- PageRank keeps the node count as a broadcast 1-row frame (no
  ``collect()``); each iteration is contribution-join → groupBy(dst),
  i.e. the textbook two-shuffle Pregel step Catalyst can pipeline.
  Dangling-node mass is dropped (documented variant) — both engines
  implement the identical recurrence, so parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

SEED_MOD = 1000  # seed parts: p_partkey % SEED_MOD == 0
MAX_HOPS = 3
PR_DAMPING = 0.85
PR_ITERS = 5

# Both directions of the undirected co-purchase edge set, distinct.
_EDGES_SQL = """
    e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    )
"""


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed edge list (src, dst), both directions.

    Self-join on the order key: both sides shuffle once on
    ``l_orderkey`` and sort-merge join co-partitioned; the ``<>``
    predicate emits both orientations so consumers never need a mirror
    union. Per-order fanout is order_size², bounded by the schema.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


@query(
    "q_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    bfs (part, hops) AS (
      SELECT p_partkey, 0 FROM part WHERE p_partkey % {SEED_MOD} = 0
      UNION
      SELECT e0.dst, bfs.hops + 1
      FROM bfs JOIN e0 ON e0.src = bfs.part
      WHERE bfs.hops < {MAX_HOPS}
    )
    SELECT part AS part_key, CAST(min(hops) AS INT) AS hops
    FROM bfs GROUP BY part
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop distance from seed parts over the co-purchase graph,
    depth-bounded at {MAX_HOPS}.

    Frontier-only expansion: each unrolled step joins only the nodes
    first reached in the previous step against the edge list, then
    left_anti-prunes everything already visited — the visited set grows
    by union but each JOIN input is the (shrinking) frontier, which is
    what keeps iteration cost proportional to newly-discovered nodes at
    scale. No driver-side action anywhere; the fixed depth makes the
    whole traversal one declarative plan.
    """
    edges = copurchase_edges(spark, sf_dir)
    seeds = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % SEED_MOD == 0)
        .select(F.col("p_partkey").alias("part"))
    )
    visited = seeds.withColumn("hops", F.lit(0))
    frontier = seeds
    for h in range(1, MAX_HOPS + 1):
        nbrs = (
            frontier.join(edges, frontier["part"] == edges["src"])
            .select(F.col("dst").alias("part"))
            .distinct()
        )
        new = nbrs.join(visited.select("part"), "part", "left_anti")
        visited = visited.unionByName(new.withColumn("hops", F.lit(h)))
        frontier = new
    return visited.select(
        F.col("part").alias("part_key"), F.col("hops").cast("int").alias("hops")
    )


def _pagerank_oracle() -> str:
    """Unrolled power-iteration oracle: it0 = uniform, it{{k}} = one
    contribution-sum step. Built by a Python loop so the SQL text stays
    literally in lock-step with the Spark recurrence."""
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""
    it{k} AS (
      SELECT nd.part,
             (1.0 - {PR_DAMPING}) / nc.n + {PR_DAMPING} * coalesce(c.s, 0.0) AS r
      FROM nodes nd
      CROSS JOIN nc
      LEFT JOIN (
        SELECT ec.dst, sum(p.r / ec.deg) AS s
        FROM it{k - 1} p JOIN ec ON ec.src = p.part
        GROUP BY ec.dst
      ) c ON c.dst = nd.part
    )""")
    return f"""
    WITH {_EDGES_SQL},
    nodes AS (SELECT p_partkey AS part FROM part),
    nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e0 GROUP BY src
    ),
    ec AS (SELECT e0.src, e0.dst, outdeg.deg FROM e0 JOIN outdeg USING (src)),
    it0 AS (SELECT part, 1.0 / nc.n AS r FROM nodes CROSS JOIN nc),
    {",".join(steps)}
    SELECT part AS part_key, round(r * nc.n, 4) AS rank_norm
    FROM it{PR_ITERS} CROSS JOIN nc
    """


@query("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph: damping {PR_DAMPING},
    {PR_ITERS} fixed iterations, uniform init over the full part
    universe (isolated parts keep the teleport mass). Output is the
    mean-normalized rank (pr × N, so 1.0 = average node), rounded to 4.

    Each iteration: rank ⋈ weighted-edge list on the source key →
    sum(r/deg) per destination → left join back onto the node universe
    for the teleport term. The node count rides along as a broadcast
    1-row frame — zero driver-side actions, the whole 5-step recurrence
    is one declarative plan. Dangling mass is dropped (same recurrence
    in the oracle), the standard simplification when ranks are only
    used for ordering.
    """
    edges = copurchase_edges(spark, sf_dir)
    nodes = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part")
    )
    nc = nodes.agg(F.count("*").cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(
        F.count("*").cast("double").alias("deg")
    )
    ec = edges.join(outdeg, "src")
    pr = nodes.crossJoin(F.broadcast(nc)).select(
        "part", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            pr.join(ec, pr["part"] == ec["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("s"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nc))
            .join(contrib, nodes["part"] == contrib["dst"], "left")
            .select(
                "part",
                (
                    (1.0 - PR_DAMPING) / F.col("n")
                    + PR_DAMPING * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return pr.crossJoin(F.broadcast(nc)).select(
        F.col("part").alias("part_key"),
        F.round(F.col("r") * F.col("n"), 4).alias("rank_norm"),
    )
