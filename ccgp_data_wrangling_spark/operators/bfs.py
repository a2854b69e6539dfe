"""Multi-source BFS shortest paths — the traversal primitive behind
link-distance features (distance-to-seed-set is a classic web spam /
quality signal: pages far from trusted seeds rank down), reachability
audits, and blast-radius analysis.

This is the GENERAL operator form of the inline 3-hop frontier loop
`queries/web_curation.reachability_3hops` has carried since round 2:
multi-source, directed or undirected, early-stop on an empty
frontier, configurable horizon — that query's fixed-cap special case
remains as the static-plan variant.

Synchronous frontier rounds, the CC/PageRank discipline: per round
ONE join (frontier ⋈ edges) + one min-agg against the known-distance
state, lineage truncated with localCheckpoint so the plan stays flat.
Work per round ∝ frontier out-edges; total = O(m · diameter /
cluster) with each round a single shuffle. The driver sees one
bounded scalar per round (the new-node count) — the same convergence
pattern the other iterative operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_distances"]


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_iter: int = 10,
    directed: bool = False,
) -> DataFrame:
    """(node, dist) for every node within ``max_iter`` hops of any
    source (multi-source BFS; dist = hops to the NEAREST source).
    ``directed=False`` traverses edges both ways."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    adj = (
        fwd
        if directed
        else fwd.unionAll(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    ).where(F.col("a") != F.col("b")).distinct()

    known = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = known
    for depth in range(1, max_iter + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(known, "node", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:  # bounded driver scalar
            break
        known = known.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return known
