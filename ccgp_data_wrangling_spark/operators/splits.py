"""Leakage-safe train/val/test splits.

A hash split that ignores near-duplicates leaks: a document in train
and its 0.95-Jaccard twin in test inflates every eval. The fix is to
split by *cluster*, not by document — every member of a near-dup
component rides its component's hash into the same split, so no pair
of near-dups ever straddles a split boundary.

Composition, not new machinery: near-dup pairs come from any of the
dedup candidate generators (operators/dedup), components from the
log-round star contraction (operators/components), and the split
itself is the engine's deterministic md5-uniform hash
(operators/sketches._element_hash) — no rand(), so the split is
reproducible on any cluster layout and STABLE under corpus growth
(adding documents never moves an existing singleton's split, and an
existing cluster only moves if new members merge two clusters — the
unavoidable case).

Scale: one left join of the corpus against the (much smaller)
component map, then a pure Column hash — no shuffle beyond the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccgp_data_wrangling_spark.operators.components import (
    connected_components,
)
from ccgp_data_wrangling_spark.operators.sketches import (
    HASH_SPACE,
    _element_hash,
)

__all__ = ["leakage_safe_splits"]


def leakage_safe_splits(
    docs: DataFrame,
    neardup_pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    test_frac: float = 0.1,
    val_frac: float = 0.1,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign ``split`` ∈ {train, val, test} per document.

    ``neardup_pairs`` is any (id_a, id_b) near-dup relation; documents
    absent from it are their own cluster. ``salt`` versions the split:
    changing it reshuffles everything deterministically.
    """
    comp = connected_components(neardup_pairs, "id_a", "id_b")
    base = docs.select(F.col(id_col).alias("id")).join(
        comp.withColumnRenamed("node", "id"), "id", "left"
    )
    canonical = F.coalesce(F.col("component"), F.col("id"))
    u = _element_hash(
        F.concat_ws(":", F.lit(salt), canonical.cast("string"))
    ) / F.lit(float(HASH_SPACE))
    return base.select(
        F.col("id").alias(id_col),
        canonical.alias("cluster_id"),
        F.when(u < test_frac, F.lit("test"))
        .when(u < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
