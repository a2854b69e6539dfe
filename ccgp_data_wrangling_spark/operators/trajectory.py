"""Trajectory similarity search: grid-pruned exact Hausdorff pairs.

The remaining similarity-search family from the paper corpus
(PAPERS.md: REPOSE, ICDE 2021 — distributed top-k trajectory
similarity with local reference tries): find trajectory pairs whose
**symmetric Hausdorff distance** is within a threshold, without the
all-pairs × all-points blowup.

Same candidate-restriction discipline as the rest of the engine
(geojoin's 3×3 cells, dedup's LSH bands):

1. **Simplify**: keep each trajectory's first ``max_points`` vertices
   in travel order (deterministic rank — the bounded "reference
   point" idea; verify cost per pair is then ≤ max_points²).
2. **Candidates**: each trajectory registers the grid cells its kept
   vertices cover; one side expands to the 3×3 neighborhood; pairs of
   trajectories meeting in a cell become candidates (IDS ONLY — the
   vertex payload joins back for verification). For ``threshold ≤
   cell_size`` the candidate set is **complete**: Hausdorff(A,B) ≤ t
   means A's first vertex has a B-vertex within t, and two points
   within t ≤ cell_size always sit in the same or adjacent cells, so
   that pair of cells meets in the 3×3 expansion.
3. **Verify**: exact squared-distance Hausdorff over the pair's kept
   vertices — ``H² = max(max_a min_b d², max_b min_a d²)`` via two
   (pair, vertex) min-aggregations and a pair-level max; squared
   arithmetic keeps the oracle exact (no sqrt/libm), rounded once at
   the edge.

Scale: the pair space never materializes — candidates are bounded by
cell co-occupancy, and each verify is ≤ max_points² codegen rows.
Shuffles: cells groupBy, candidate equi-join on (cell), two
verify aggregations. Skew guard: ``max_cell`` drops cells hosting
more than ``max_cell`` trajectories (boilerplate hubs), mirroring
dedup.py's hot-bucket cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["trajectory_hausdorff_pairs"]


def trajectory_hausdorff_pairs(
    points: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    order_col: str,
    *,
    cell_size: float,
    threshold: float,
    max_points: int = 30,
    max_cell: int | None = None,
) -> DataFrame:
    """(key_a, key_b, hausdorff_sq) for every trajectory pair with
    symmetric Hausdorff distance ≤ ``threshold`` (complete for
    ``threshold ≤ cell_size``); ``hausdorff_sq`` is the exact squared
    distance rounded to 4 dp. ``key_a < key_b`` canonical order.
    """
    if threshold > cell_size:
        raise ValueError(
            "candidate completeness requires threshold <= cell_size"
        )
    w = W.partitionBy(key_col).orderBy(order_col)
    pts = (
        points.select(
            F.col(key_col).alias("k"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
            F.row_number().over(w).alias("__rn"),
        )
        .where(F.col("__rn") <= max_points)
        .drop("__rn")
    )

    cells = pts.select(
        "k",
        F.floor(F.col("x") / cell_size).alias("cx"),
        F.floor(F.col("y") / cell_size).alias("cy"),
    ).distinct()
    if max_cell is not None:
        sizes = cells.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("__n"))
        cells = cells.join(
            sizes.where(F.col("__n") <= max_cell).drop("__n"), ["cx", "cy"]
        )
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    left_cells = cells.select(
        F.col("k").alias("ka"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "ka",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    ).distinct()
    cand = (
        left_cells.join(
            cells.select(F.col("k").alias("kb"), "cx", "cy"), ["cx", "cy"]
        )
        .where(F.col("ka") < F.col("kb"))
        .select("ka", "kb")
        .distinct()
    )

    a = pts.select(
        F.col("k").alias("ka"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = pts.select(
        F.col("k").alias("kb"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    # explicit multiplications (not pow): bit-identical to the
    # oracle's (ax-bx)*(ax-bx) arithmetic on both engines
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    d2 = dx * dx + dy * dy
    pair_pts = cand.join(a, "ka").join(b, "kb").select(
        "ka", "kb", "ax", "ay", "bx", "by", d2.alias("d2")
    )
    # directed: for each A-vertex its nearest B (min d2), then the
    # worst such vertex (max) — and symmetrically
    dir_a = (
        pair_pts.groupBy("ka", "kb", "ax", "ay")
        .agg(F.min("d2").alias("m"))
        .groupBy("ka", "kb")
        .agg(F.max("m").alias("h_ab"))
    )
    dir_b = (
        pair_pts.groupBy("ka", "kb", "bx", "by")
        .agg(F.min("d2").alias("m"))
        .groupBy("ka", "kb")
        .agg(F.max("m").alias("h_ba"))
    )
    t2 = float(threshold) * float(threshold)
    return (
        dir_a.join(dir_b, ["ka", "kb"])
        .select(
            F.col("ka").alias("key_a"),
            F.col("kb").alias("key_b"),
            F.round(F.greatest("h_ab", "h_ba"), 4).alias("hausdorff_sq"),
        )
        .where(F.col("hausdorff_sq") <= round(t2, 4))
    )
