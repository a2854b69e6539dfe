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
   vertices — ``H² = max(max_a min_b d², max_b min_a d²)`` — as a
   vectorized numpy block per candidate pair inside ONE Arrow
   ``mapInPandas`` pass: each pair row carries the two trajectories'
   vertex coordinate arrays (collected once per trajectory), and the
   kernel builds the max_points² distance matrix with a single
   broadcasted subtraction. One row in, one row out — no point-pair
   explode, no verify shuffle.

   Why a pandas kernel and not builtins (measured at sf0.1, ~94k
   candidate pairs × ≤900 vertex pairs): exploding (pair × vertex ×
   vertex) rows through two aggregations shuffles 84M rows and
   evaluates the join twice (~20 s); nested array higher-order
   functions avoid the shuffle but lambdas are INTERPRETED per
   element (~170M lambda evals, ~55 s); the numpy block form runs the
   same arithmetic as C-contiguous matrix ops (~2 s). This is the
   engine's documented UDF policy: Python only where builtins
   genuinely can't express the computation efficiently, and then
   Arrow-vectorized, never per-row.

Squared arithmetic keeps the oracle exact (no sqrt/libm — numpy
float64 matches the SQL engines' double arithmetic bit-for-bit on
these small integers), rounded once at the edge.

Scale: the pair space never materializes — candidates are bounded by
cell co-occupancy. Shuffles: vertex collect per trajectory, cells
groupBy, candidate equi-join, two array joins keyed by trajectory id.
Skew guard: ``max_cell`` drops cells hosting more than ``max_cell``
trajectories (boilerplate hubs), mirroring dedup.py's hot-bucket cap.
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
    # alias key_col -> k BEFORE the window and partition the window on
    # the ALIASED column: if the window partitioned on the original
    # column, the downstream groupBy("k") would see two unrelated
    # attributes (the caller's key and our alias both derived from the
    # same source) and re-shuffle the points a second time per branch.
    # Keyed on k itself, the window's hashpartitioning(k) satisfies the
    # collect_list aggregate's clustering requirement and the second
    # Exchange disappears from every traj branch (guide §2.4: two
    # operations keyed the same way share one exchange).
    w = W.partitionBy("k").orderBy("__o")
    pts = (
        points.select(
            F.col(key_col).alias("k"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
            F.col(order_col).alias("__o"),
        )
        .select("k", "x", "y", F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") <= max_points)
        .drop("__rn")
    )

    # one vertex-struct array per trajectory; split into parallel
    # coordinate arrays AFTER collecting (transform over the same
    # struct list keeps x[i]/y[i] paired — two independent
    # collect_lists would not guarantee a consistent order). Hausdorff
    # is order-insensitive (min/max over all vertices), so the
    # nondeterministic collect_list order cannot change the result.
    traj = pts.groupBy("k").agg(
        F.collect_list(F.struct("x", "y")).alias("v")
    ).select(
        "k",
        F.transform("v", lambda p: p["x"]).alias("xs"),
        F.transform("v", lambda p: p["y"]).alias("ys"),
    )

    # each trajectory's distinct covered cells, derived from the
    # ALREADY-AGGREGATED per-trajectory arrays: array_distinct inside
    # the row replaces a corpus-wide distinct on (k, cx, cy), so the
    # cells relation costs NO exchange of its own — it rides the
    # groupBy(k) partitioning the window pass already established
    # (guide §2.4: share one exchange). Same set of (k, cx, cy) rows
    # as the former pts.select(floor..).distinct() — per-trajectory
    # distinct equals global distinct when k is part of the key.
    cells = traj.select(
        "k",
        F.explode(
            F.array_distinct(
                F.zip_with(
                    "xs",
                    "ys",
                    lambda x, y: F.struct(
                        F.floor(x / cell_size).alias("cx"),
                        F.floor(y / cell_size).alias("cy"),
                    ),
                )
            )
        ).alias("c"),
    ).select("k", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
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

    pairs = (
        cand.join(
            traj.select(
                F.col("k").alias("ka"),
                F.col("xs").alias("xa"),
                F.col("ys").alias("ya"),
            ),
            "ka",
        )
        .join(
            traj.select(
                F.col("k").alias("kb"),
                F.col("xs").alias("xb"),
                F.col("ys").alias("yb"),
            ),
            "kb",
        )
    )

    t2 = round(float(threshold) * float(threshold), 4)

    def verify(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ka, kb, h2 = [], [], []
            for row in pdf.itertuples(index=False):
                ax = np.asarray(row.xa, dtype=np.float64)
                ay = np.asarray(row.ya, dtype=np.float64)
                bx = np.asarray(row.xb, dtype=np.float64)
                by = np.asarray(row.yb, dtype=np.float64)
                dx = ax[:, None] - bx[None, :]
                dy = ay[:, None] - by[None, :]
                d2 = dx * dx + dy * dy
                h = max(d2.min(axis=1).max(), d2.min(axis=0).max())
                h = round(float(h), 4)
                if h <= t2:
                    ka.append(row.ka)
                    kb.append(row.kb)
                    h2.append(h)
            yield pd.DataFrame(
                {"key_a": ka, "key_b": kb, "hausdorff_sq": h2}
            )

    ktype = points.schema[key_col].dataType.simpleString()
    # spread the Python verify across the cluster: AQE coalesces the
    # small candidate join to a handful of partitions, which would
    # serialize the numpy kernel
    par = points.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(par).mapInPandas(
        verify, schema=f"key_a {ktype}, key_b {ktype}, hausdorff_sq double"
    )
