"""Fixed-iteration PageRank over an edge list — the canonical
iterative join+aggregate algorithm, Spark-first.

Training pipelines use link-graph centrality as a document-quality
prior (the original use) and for crawl-frontier weighting. The
reference has no graph surface; this is a beyond-reference scale-path
operator in the same family as ``components.py``.

Design for scale:

* each iteration is one shuffle: contributions = ranks ⋈ edges on the
  source key, then a hash aggregate on the destination — no corpus
  windows, no driver state beyond the loop counter;
* the out-degree table is computed ONCE and reused every iteration;
* ``localCheckpoint`` after each iteration truncates lineage, keeping
  plan size (and scheduler cost) constant in the iteration count —
  without it the plan doubles per round, the classic iterative-Spark
  failure;
* dangling mass (nodes with no out-edges) is redistributed uniformly
  each round via one scalar aggregate, so total rank mass is
  conserved — ranks converge to a probability distribution and the
  result is independent of partitioning;
* a FIXED iteration count (no convergence fingerprint) keeps the
  operator deterministic and oracle-expressible (DuckDB recursive CTE
  runs the same rounds).

Float discipline: per-iteration arithmetic stays unrounded doubles on
both engines; only the final output rounds (4 dp). Contribution sums
are order-insensitive up to double addition ulps — at graph scales
the driver's %.6f canonicalization absorbs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank rounds.

    The node set is every id appearing as a source or destination;
    initial rank is uniform 1/N. Parallel edges contribute
    proportionally (they are kept, not deduped) — dedupe upstream if
    multi-links shouldn't weigh more.
    """
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one bounded scalar; also materializes the checkpoint
    out_deg = (
        e.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=True)
    )

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(out_deg, "s")
            .select(F.col("d").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        # dangling mass: rank held by nodes with no out-edges, spread
        # uniformly (one tiny scalar aggregate per round)
        dangling = (
            ranks.join(out_deg.withColumnRenamed("s", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .head()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", round_to).alias("rank"))


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count via degree-ordered orientation —
    one-row frame ``(n_triangles)``.

    The naive 3-way self-join enumerates each triangle 6× and lets
    high-degree hubs explode the intermediate: a hub of degree d
    contributes d² wedge rows. Orienting every edge from the
    lower-(degree, id) endpoint to the higher one makes the wedge
    join Σ out_degree² where out-degree is bounded by √(2·|E|) for
    ANY graph (each triangle counted exactly once, no direction
    ambiguity because (degree, id) is a total order) — the standard
    MapReduce-era trick (Suri & Vassilvitskii 2011) that makes
    triangle counting feasible on skewed graphs.

    Shuffles: degree aggregate, orientation join, wedge groupBy-join,
    closing-edge semi-join — all on node/edge keys.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .dropDuplicates()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    # orient: from the (degree, id)-smaller endpoint to the larger
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    # close the wedge against the UNDIRECTED edge set (id-normalized
    # a < b, matching the wedge's x < y): the closing edge's degree
    # orientation may point either way, so checking the oriented set
    # would silently drop triangles whose closing edge runs y→x
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
