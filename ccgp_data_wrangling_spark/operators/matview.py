"""Incremental materialized-aggregate maintenance.

A 100 TB pipeline cannot rebuild its rollups (revenue per segment,
events per user-day, tokens per source) from scratch on every
refresh; it folds the DELTA into the stored aggregate:

    new_state(g) = combine(old_state(g), agg(delta where group = g))

That works exactly for the self-decomposable aggregates — COUNT and
SUM add, MIN/MAX combine with MIN/MAX — and this operator maintains
all four plus the AVG derived from (sum, count). Deletions/updates
are handled the standard way: the caller supplies the delta as
retractions + insertions (old row with weight −1, new row with +1),
which COUNT/SUM absorb natively; MIN/MAX cannot be incrementally
retracted (removing the current min needs the runner-up), so a delta
containing retractions marks affected groups for targeted
recompute — the returned frame flags them (``needs_rescan``), and
the flagged set is exactly the groups whose min/max may be stale.

Scale shape: one hash aggregate over the (small) delta + one
key-partitioned outer join against the state — cost ∝ delta +
touched groups, never the base table. The state IS the wire format:
persist it (ParquetTable / MERGE family) and fold each batch.

Reference parity: the reference recomputes it summary frames in
pandas from full collections on every run (utils/ summary helpers);
this is the beyond-reference incremental answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["rollup_state", "rollup_fold"]

_STATE_COLS = ("n", "total", "vmin", "vmax")


def rollup_state(
    df: DataFrame, group_col: str, value_col: str, *, weight_col: str | None = None
) -> DataFrame:
    """Build ``(g, n, total, vmin, vmax)`` aggregate state from rows.

    ``weight_col`` (±1) turns rows into insertions/retractions for
    the additive components; weighted rows do NOT contribute
    retractions to vmin/vmax (see module docstring).
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    ins = F.col(value_col).isNotNull() & (w > 0)
    return df.groupBy(F.col(group_col).alias("g")).agg(
        F.sum(w).cast("long").alias("n"),
        F.sum(w * F.col(value_col)).alias("total"),
        F.min(F.when(ins, F.col(value_col))).alias("vmin"),
        F.max(F.when(ins, F.col(value_col))).alias("vmax"),
        F.max(F.when(w < 0, True).otherwise(False)).alias("has_retract"),
    )


def rollup_fold(state: DataFrame, delta_state: DataFrame) -> DataFrame:
    """Fold a delta's state into the stored state.

    Returns the merged ``(g, n, total, vmin, vmax, avg,
    needs_rescan)`` — ``needs_rescan`` marks groups whose delta
    carried retractions (their vmin/vmax are upper/lower BOUNDS until
    a targeted rescan refreshes them; n/total/avg remain exact).
    """
    s = state.select(
        "g", "n", "total", "vmin", "vmax", F.lit(False).alias("has_retract")
    )
    d = delta_state
    merged = (
        s.unionByName(d)
        .groupBy("g")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.max("has_retract").alias("needs_rescan"),
        )
        .where(F.col("n") > 0)
    )
    return merged.select(
        "g",
        "n",
        F.round("total", 4).alias("total"),
        "vmin",
        "vmax",
        F.round(F.col("total") / F.col("n"), 4).alias("avg"),
        "needs_rescan",
    )
