"""Deterministic synchronous label propagation (community detection).

Classic LPA assigns each node the most frequent label among its
neighbors, iterating until labels stabilize. Two sources of
nondeterminism plague textbook LPA — random tie-breaks and
asynchronous update order; both are removed here: updates are
SYNCHRONOUS (round t+1 reads only round t) and the winning label is
the lexicographic max of (count, −label) — most frequent, ties to
the SMALLEST label. With a fixed round count the result is a pure
function of the edge set, so it replays in a round-unrolled SQL
oracle and is bit-stable on any cluster layout.

Scale shape per round: one shuffle join (labels ⋈ edges on the node
key) + one two-level hash aggregate (count neighbor labels, then
argmax via max_by — no window). Constant plan size per round with
``localCheckpoint`` lineage truncation, same discipline as
operators/components.py and pagerank.py. Rounds are a parameter —
LPA converges in a handful of rounds on social/web graphs (it
propagates labels one hop per round).

Versus connected components: CC merges everything reachable; LPA
finds DENSE regions — two cliques joined by one bridge edge stay
separate communities but are one component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["label_propagation"]


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_rounds: int = 3,
) -> DataFrame:
    """``(node, label)`` after ``n_rounds`` synchronous LPA rounds.

    Self-loops are ignored; the graph is treated as undirected.
    Isolated nodes never appear (no edges → caller's business, as in
    connected_components).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).dropDuplicates()
    labels = sym.select(F.col("a").alias("node")).dropDuplicates().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(n_rounds):
        nbr = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        counted = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        # min_by over (-count, label): most-frequent first, ties to the
        # SMALLEST label — struct ordering works for string node ids
        # too, where the previous unary -label only handled numerics.
        labels = counted.groupBy("node").agg(
            F.min_by(
                F.col("label"), F.struct((-F.col("c")), F.col("label"))
            ).alias("label")
        )
        labels = labels.localCheckpoint(eager=False)
    return labels
