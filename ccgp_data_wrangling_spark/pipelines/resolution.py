"""Entity resolution end-to-end: blocking → pair scoring → match
clustering → survivorship.

The reference's central workload IS record linkage (linking fastq
files to samples, ranked conflict resolution —
ccgp-data-wrangling utils/gdrive.py + the linkage logic re-expressed
in operators/linkage.py). This pipeline is the general-purpose
version a metadata platform needs next: collapse duplicate RECORDS
(same real-world entity entered twice with variations) into golden
records.

Stages and their scale shapes:

1. **Blocking** — a deterministic key projection (here: the digit
   string of the normalized name). Candidate pairs form per block
   via self-join; a ``max_block`` guard drops degenerate blocks
   (the empty-key block would otherwise square). Cost: one shuffle
   on block keys, pairs bounded by Σ|block|².
2. **Scoring** — pure-Column field similarities on candidate pairs
   only: token-set Jaccard on names (exact integer set ops,
   rounded 4 dp) + an exact-equality bonus on the balance field.
   No UDF, no Python.
3. **Matching** — threshold on the composite score → an edge list.
4. **Clustering** — large-star/small-star connected components
   (operators/components.py, O(log² n) rounds).
5. **Survivorship** — golden record per entity by deterministic
   field rules: longest name (ties → lexicographically greatest),
   max balance, member count. One hash aggregate per entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccgp_data_wrangling_spark.operators.components import connected_components

__all__ = ["resolve_entities"]


def _name_tokens(col: F.Column) -> F.Column:
    return F.array_distinct(F.split(F.trim(F.lower(col)), r"\s+"))


def resolve_entities(
    records: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    balance_col: str = "balance",
    threshold: float = 0.4,
    max_block: int = 50,
) -> DataFrame:
    """``(entity_id, n_records, canonical_name, max_balance)`` golden
    records, one per resolved entity (singletons included).
    """
    base = records.select(
        F.col(id_col).alias("rid"),
        F.col(name_col).alias("nm"),
        F.col(balance_col).alias("bal"),
        F.regexp_replace(F.trim(F.lower(F.col(name_col))), "[^0-9]", "").alias(
            "blk"
        ),
    )
    # blocking with a skew guard: degenerate blocks (no digits at all,
    # boilerplate names) are dropped from CANDIDATE GENERATION only —
    # their records still surface as singleton entities below
    sizes = base.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
    blocked = base.join(
        F.broadcast(
            sizes.where((F.col("n") <= max_block) & (F.col("blk") != ""))
        ).select("blk"),
        "blk",
    )
    left = blocked.select(
        "blk",
        F.col("rid").alias("rid_a"),
        _name_tokens(F.col("nm")).alias("tok_a"),
        F.col("bal").alias("bal_a"),
    )
    right = blocked.select(
        "blk",
        F.col("rid").alias("rid_b"),
        _name_tokens(F.col("nm")).alias("tok_b"),
        F.col("bal").alias("bal_b"),
    )
    inter = F.size(F.array_intersect("tok_a", "tok_b"))
    union = F.size(F.array_union("tok_a", "tok_b"))
    jac = F.round(inter.cast("double") / union, 4)
    score = F.round(
        jac * 0.8 + (F.col("bal_a") == F.col("bal_b")).cast("double") * 0.2, 4
    )
    edges = (
        left.join(right, "blk")
        .where(F.col("rid_a") < F.col("rid_b"))
        .withColumn("score", score)
        .where(F.col("score") >= threshold)
        .select("rid_a", "rid_b")
        .dropDuplicates(["rid_a", "rid_b"])
    )
    comp = connected_components(edges, "rid_a", "rid_b")
    # singletons: records in no match edge resolve to themselves
    assigned = base.join(
        comp, base.rid == comp.node, "left"
    ).select(
        "rid",
        "nm",
        "bal",
        F.coalesce(F.col("component"), F.col("rid")).alias("entity_id"),
    )
    # survivorship: longest name wins, ties broken lexicographically
    # DESC so the pick is total-ordered; balance keeps the max
    return assigned.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.max_by(
            F.col("nm"), F.struct(F.length("nm").alias("l"), F.col("nm"))
        ).alias("canonical_name"),
        F.max("bal").alias("max_balance"),
    )
