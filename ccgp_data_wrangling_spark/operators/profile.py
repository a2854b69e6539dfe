"""Column profiling — one-pass per-column stats for table QC.

The reference audits its tables with ad-hoc scripts (SURVEY.md §5:
reconciliation reports, suspicious-count audits); this generalizes
them into one scan. ``approx=True`` swaps exact COUNT(DISTINCT) for
HyperLogLog++ ``approx_count_distinct`` — the 100 TB path, since one
exact distinct per profiled column multiplies the shuffle via
aggregate expansion, while HLL sketches merge map-side in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "check_expectations"]


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column: total rows, null count, (approx)
    distinct count, min and max rendered as strings (uniform schema
    across column types). Executes as a single aggregation pass.
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c, rsd) if approx else F.countDistinct(c)
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            distinct.alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def check_expectations(
    df: DataFrame,
    rules: list[tuple[str, Column]],
) -> DataFrame:
    """Declarative data-contract validation: one row per rule —
    ``(rule, n_rows, n_violations, violation_rate, passed)``.

    ``rules`` are (name, predicate) pairs where the predicate states
    what GOOD rows satisfy; a NULL predicate result counts as a
    violation (three-valued logic would otherwise silently pass
    null-laden columns, the classic expectations-framework bug).

    Scale: every rule folds into ONE aggregate pass over the data —
    conditional sums, no per-rule scan, no window. Adding a rule adds
    a codegen'd expression, not a job. This is the gate a 100 TB
    ingest runs between landing and publishing (profile_columns
    describes the data; this enforces the contract).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        ok = F.coalesce(pred.cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(~ok, 1).otherwise(0)).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").cast("long").alias("n_violations"),
            )
            for name, _ in rules
        ]
    )
    return (
        row.select(F.col("__n").cast("long").alias("n_rows"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            "n_rows",
            F.col("p.n_violations").alias("n_violations"),
            F.round(
                F.col("p.n_violations") / F.greatest(F.col("n_rows"), F.lit(1)), 6
            ).alias("violation_rate"),
            (F.col("p.n_violations") == 0).alias("passed"),
        )
    )
