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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
    salt_col: str = "__salt",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join by explicit salting.

    The fact side gets a deterministic salt in [0, n_salts); the dim
    side is replicated once per salt value; the join runs on
    (keys…, salt). A hot key's fact rows spread over ``n_salts``
    reducer tasks instead of one, at the cost of dim×n_salts shuffle
    volume — use when the dim is too big to broadcast AND AQE's
    runtime skew split can't apply (e.g. the skewed side feeds a
    co-partitioned downstream op). Supports inner and left joins
    (each fact row still matches exactly its key's dim rows; right/
    full would see the replicated dim side and are refused).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    fact_s = fact.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    dim_s = dim.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    return fact_s.join(dim_s, list(on) + [salt_col], how).drop(salt_col)
