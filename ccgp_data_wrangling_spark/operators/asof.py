"""As-of (nearest-timestamp) join — an operator Spark lacks natively.

The reference has no as-of join (SURVEY.md §2.4: all joins are equi or
substring-theta), but a temporal event model makes it a first-class
need at scale (e.g. attach the latest prior click to each purchase).
Implemented as a composition of existing DataFrame ops — union + one
keyed window — per the "composition before UDF" policy.

Scale path: the naive formulation is a range theta-join
(``l.key = r.key AND r.ts <= l.ts`` + argmax), which Spark executes as
a per-key cross product. This implementation instead unions both
sides, shuffles ONCE on the equi-key, sorts within partitions, and
carries the most recent right-side row across each partition with
``last(..., ignoreNulls=True)``. Cost is one shuffle + one sort,
independent of match distance; no pair-space blowup on hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.functions.temporal import epoch_seconds

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the single right row with the
    nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) ``left_ts``, matched within ``on`` equi-key groups.

    Unmatched left rows are kept with null right columns (LEFT ASOF
    semantics, matching DuckDB's ``ASOF LEFT JOIN``). ``tolerance_sec``
    additionally nulls out matches farther than that many seconds.

    Right payload columns keep their names; a name shared with a left
    column (other than the keys) raises — rename before joining. For
    deterministic results, the right side should have at most one row
    per (key, ts) — same contract as DuckDB/pandas as-of.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    left_payload = [c for c in left.columns if c not in keys]
    right_payload = [c for c in right.columns if c not in keys]
    clash = set(left_payload) & set(right_payload)
    if clash:
        raise ValueError(f"rename right columns clashing with left: {sorted(clash)}")

    lf = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_payload
        ],
    )
    rf = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        *[F.col(c) for c in right_payload],
    )
    u = lf.unionByName(rf)

    right_row = F.when(
        F.col("__is_left") == 0, F.struct(*[F.col(c) for c in right_payload])
    )
    if direction == "backward":
        # right rows sort before left at equal ts → inclusive match
        w = (
            W.partitionBy(*keys)
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        matched = F.last(right_row, ignorenulls=True).over(w)
    else:
        w = (
            W.partitionBy(*keys)
            .orderBy(F.asc("__ts"), F.desc("__is_left"))
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        matched = F.first(right_row, ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).where(F.col("__is_left") == 1)
    if tolerance_sec is not None:
        gap = F.abs(
            epoch_seconds(F.col("__ts"))
            - epoch_seconds(F.col("__m").getField(right_ts))
        )
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_sec)), F.col("__m"))
        )
    return out.select(
        *keys,
        *[F.col(c) for c in left_payload],
        *[F.col("__m").getField(c).alias(c) for c in right_payload],
    )
