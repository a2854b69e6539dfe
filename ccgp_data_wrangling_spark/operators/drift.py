"""Distribution-drift detection: Population Stability Index (PSI).

The standard production-ML monitor: bin a reference period's value
distribution into deciles, measure how much a comparison period's
mass moved across those bins,
``PSI = Σ_bins (p_cmp − p_ref) · ln(p_cmp / p_ref)``.
Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 action.

Scale shape: one exact-percentile aggregate over the reference slice
(per group — the same ``F.percentile`` shape as
queries/relational.percentiles_by_flag; swap in approx_percentile at
100 TB, the operator signature doesn't change), producing a ≤groups×1
row bounds dim that broadcasts back; then ONE conditional hash
aggregate over both periods computes every bin count. No window over
the data, no sort.

Determinism: bin bounds rounded to 6 dp before the comparison, each
``ln`` term rounded to 6 dp (libm-proof policy, as bm25/bigram-LM),
counts are integers — the DuckDB oracle replays identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["psi_drift", "reference_bins", "bin_counts", "psi_readout"]

#: add-k mass so empty bins never divide by zero.
SMOOTHING = 0.5


def psi_drift(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    ts_col: str,
    split_ts: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group PSI of ``value_col`` between rows before and after
    ``split_ts``. Returns (group, n_ref, n_cmp, psi, drift_band).
    """
    g, v = F.col(group_col), F.col(value_col)
    is_ref = F.col(ts_col) < F.lit(split_ts).cast("timestamp")

    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = (
        df.where(is_ref)
        .groupBy(g.alias("g"))
        .agg(
            F.transform(
                F.percentile(v, F.array(*[F.lit(q) for q in qs])),
                lambda b: F.round(b, 6),
            ).alias("bounds")
        )
    )
    # bin index = number of bounds ≤ value (0..n_bins-1); one pass,
    # bounds ride a broadcast join
    binned = (
        df.select(g.alias("g"), v.alias("v"), is_ref.alias("is_ref"))
        .join(F.broadcast(bounds), "g")
        .select(
            "g",
            "is_ref",
            F.size(F.filter(F.col("bounds"), lambda b: b <= F.col("v"))).alias("bin"),
        )
    )
    counts = binned.groupBy("g", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("c_cmp"),
    )
    totals = counts.groupBy("g").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cmp").alias("n_cmp")
    )
    smooth_tot = F.lit(SMOOTHING * n_bins)
    p_ref = (F.col("c_ref") + SMOOTHING) / (F.col("n_ref") + smooth_tot)
    p_cmp = (F.col("c_cmp") + SMOOTHING) / (F.col("n_cmp") + smooth_tot)
    term = (p_cmp - p_ref) * F.round(F.ln(p_cmp / p_ref), 6)
    psi = (
        counts.join(F.broadcast(totals), "g")
        .groupBy("g")
        .agg(
            F.any_value("n_ref").alias("n_ref"),
            F.any_value("n_cmp").alias("n_cmp"),
            F.round(F.sum(term), 4).alias("psi"),
        )
    )
    band = (
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "drifting")
        .otherwise("action")
    )
    return psi.select(
        F.col("g").alias(group_col),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cmp").cast("long").alias("n_cmp"),
        "psi",
        band.alias("drift_band"),
    )


# ---------------------------------------------------------------------------
# Decomposed pieces for incremental / streaming monitoring
# ---------------------------------------------------------------------------


def reference_bins(
    ref: DataFrame, *, group_col: str, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Frozen reference state for drift monitoring:
    ``(g, bounds, bin, c_ref)`` — decile bounds over the reference
    slice plus its own per-bin counts. Computed ONCE; every future
    comparison bins against these bounds.
    """
    g, v = F.col(group_col), F.col(value_col)
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = ref.groupBy(g.alias("g")).agg(
        F.transform(
            F.percentile(v, F.array(*[F.lit(q) for q in qs])),
            lambda b: F.round(b, 6),
        ).alias("bounds")
    )
    counts = bin_counts(ref, bounds, group_col=group_col, value_col=value_col)
    return bounds.join(
        counts.withColumnRenamed("c", "c_ref"), "g"
    ).select("g", "bounds", "bin", "c_ref")


def bin_counts(
    df: DataFrame,
    bounds: DataFrame,
    *,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """``(g, bin, c)`` histogram of ``df`` against frozen bounds.

    Additive and mergeable — fold micro-batch histograms by summing
    ``c`` per (g, bin); the state stays ≤ groups × n_bins rows.
    """
    return (
        df.select(
            F.col(group_col).alias("g"), F.col(value_col).alias("v")
        )
        .join(F.broadcast(bounds.select("g", "bounds").dropDuplicates(["g"])), "g")
        .select(
            "g",
            F.size(
                F.filter(F.col("bounds"), lambda b: b <= F.col("v"))
            ).alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def psi_readout(ref_state: DataFrame, cmp_counts: DataFrame, *, n_bins: int = 10) -> DataFrame:
    """PSI per group from frozen reference state + comparison counts.

    Same smoothing/rounding arithmetic as :func:`psi_drift` (add-0.5
    mass, 6-dp ln, 4-dp PSI), so a one-shot batch split and a folded
    stream of micro-batches produce identical numbers over identical
    data.
    """
    joined = (
        ref_state.select("g", "bin", "c_ref")
        .join(
            cmp_counts.select("g", "bin", F.col("c").alias("c_cmp")),
            ["g", "bin"],
            "full_outer",
        )
        .select(
            "g",
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cmp", F.lit(0)).alias("c_cmp"),
        )
    )
    totals = joined.groupBy("g").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cmp").alias("n_cmp")
    )
    smooth_tot = F.lit(SMOOTHING * n_bins)
    p_ref = (F.col("c_ref") + SMOOTHING) / (F.col("n_ref") + smooth_tot)
    p_cmp = (F.col("c_cmp") + SMOOTHING) / (F.col("n_cmp") + smooth_tot)
    term = (p_cmp - p_ref) * F.round(F.ln(p_cmp / p_ref), 6)
    band = (
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "drifting")
        .otherwise("action")
    )
    return (
        joined.join(F.broadcast(totals), "g")
        .groupBy("g")
        .agg(
            F.any_value("n_ref").cast("long").alias("n_ref"),
            F.any_value("n_cmp").cast("long").alias("n_cmp"),
            F.round(F.sum(term), 4).alias("psi"),
        )
        .withColumn("drift_band", band)
    )
