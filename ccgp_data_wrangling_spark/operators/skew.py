"""Skew-handling operators.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
most join skew at runtime. What AQE does NOT fix is aggregation skew:
a ``groupBy`` over a heavy-hitter key funnels that key's every row
through one reducer task. :func:`salted_aggregate` implements the
classic two-phase fix — pre-aggregate on (key, salt), then finish on
key — for algebraic aggregates (the partial and final functions are
supplied separately, like Spark's own partial aggregation, but with
an explicit fan-out so no single task ever sees a whole hot key).

At 100 TB: use for per-project/per-domain counters where a handful of
projects dominate (the reference's per-project world is exactly this
shape — TB-scale projects next to empty ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    *,
    n_salts: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name → aggregate over the raw rows (phase 1,
    grouped by keys + salt). ``final_aggs``: name → aggregate over the
    phase-1 partials (grouped by keys). E.g. a skew-safe count/sum/max:

        salted_aggregate(df, ["k"],
            {"c": F.count(F.lit(1)), "s": F.sum("v"), "m": F.max("v")},
            {"c": F.sum("c"),        "s": F.sum("s"), "m": F.max("m")})

    The salt is a deterministic spread (``spark_partition_id`` mixed
    with a per-row monotonic id) — no RNG, reproducible plans.
    """
    salted = df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    phase1 = salted.groupBy(*keys, salt_col).agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )
