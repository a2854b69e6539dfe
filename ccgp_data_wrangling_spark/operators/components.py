"""Distributed connected components — near-dup cluster canonicalization.

The dedup operators (operators/dedup.py) emit verified near-duplicate
PAIRS. A training-data pipeline needs one more step: group the pairs
into clusters and keep one canonical document per cluster. Pairs are
edges; clusters are connected components.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014). Unlike
naive min-label propagation (O(graph diameter) rounds — a 1M-doc
near-dup chain would need 1M shuffles), star contraction converges in
O(log^2 n) rounds and each round is two hash aggregations plus a join
— no collect_list materialization of neighborhoods, so a hub node with
10M neighbors never builds a 10M-element array in one task (the
neighborhood min is a map-side-combined agg; the emit is a join).

Each round the edge set is localCheckpoint()ed: iterative DataFrame
loops otherwise accumulate lineage and re-execute the whole history
every round. On a cluster you would use ``spark.sparkContext
.setCheckpointDir`` + ``checkpoint()`` for fault-tolerant truncation;
localCheckpoint is the single-process equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (min, max), no self-loops, distinct."""
    a, b = F.col("a"), F.col("b")
    return (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    nbrs = _symmetrize(edges)
    mins = nbrs.groupBy("a").agg(F.min("b").alias("__mn"))
    mins = mins.select("a", F.least("__mn", F.col("a")).alias("__m"))
    return (
        nbrs.where(F.col("b") > F.col("a"))
        .join(mins, "a")
        .select(F.col("b").alias("a"), F.col("__m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Attach u and every smaller neighbor to min(Γ_<(u) ∪ {u})."""
    nbrs = _symmetrize(edges).where(F.col("b") < F.col("a"))
    mins = nbrs.groupBy("a").agg(F.min("b").alias("__m"))
    attached = nbrs.join(mins, "a").select(
        F.col("b").alias("a"), F.col("__m").alias("b")
    )
    self_links = mins.select(F.col("a"), F.col("__m").alias("b"))
    return attached.unionAll(self_links)


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: an order-insensitive combine that cannot
    # overflow under ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the node's component.

    Nodes with no edges are the caller's business (their component is
    themselves) — this keeps the operator free of a corpus-wide scan.
    """
    e = _normalize(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    e = e.localCheckpoint(eager=True)
    fp = _fingerprint(e)
    for _ in range(max_iter):
        nxt = _normalize(_small_star(_large_star(e)))
        nxt = nxt.localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        e, prev_fp = nxt, fp
        fp = nfp
        if nfp == prev_fp:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # Converged edge set is a union of stars rooted at component minima:
    # every node's min neighbor (or itself, for roots) is the component.
    nbrs = _symmetrize(e)
    comp = nbrs.groupBy("a").agg(F.min("b").alias("__mn"))
    return comp.select(
        F.col("a").alias("node"),
        F.least("__mn", F.col("a")).alias("component"),
    )


def neardup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size, is_canonical).

    ``cluster_id`` is the smallest doc id in the cluster; that doc is
    the canonical survivor (deterministic keep-first policy — the same
    tie-break the exact dedup query uses). Only documents that appear
    in at least one pair are returned: at 100 TB the pair set is tiny
    next to the corpus and the final keep/drop is an anti-join of the
    corpus against the non-canonical members.
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )
