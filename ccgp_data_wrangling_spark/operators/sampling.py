"""Deterministic weighted sampling: priority sampling and
token-budget corpus selection.

Training-data pipelines constantly need "a weighted sample of the
corpus" (for eval slices, for mixture tuning, for cost estimates) and
"as much of the corpus as fits a token budget". Both must be
*reproducible*: the same corpus must yield the same sample on any
cluster layout, or an experiment can't be re-run. Everything here
derives randomness from the md5 element hash
(operators/sketches._element_hash) — no ``rand()`` anywhere — and
avoids transcendental functions entirely (only IEEE division and
comparison, which are bit-deterministic across engines), so every
operator carries an exact DuckDB oracle.

Priority sampling (Duffield, Lund, Thorup, JACM 2007): item i gets
priority ``q_i = w_i / u_i`` with ``u_i`` uniform in (0, 1]; keep the
top-k priorities, let τ be the (k+1)-th; then ``sum(max(w_i, τ))``
over the sample is an unbiased estimator of the group's total weight
— near-optimal variance among all k-sample schemes. The
Efraimidis-Spirakis exponential-jump scheme needs ``u^(1/w)`` whose
``pow``/``ln`` rounding differs across libm implementations; priority
sampling's plain division does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ccgp_data_wrangling_spark.operators.sketches import (
    HASH_SPACE,
    _element_hash,
)

__all__ = ["priority_sample", "priority_sum_estimate", "token_budget_select", "negative_samples"]


def _priority(weight: F.Column, id_col: F.Column) -> F.Column:
    """q = w / u with u = h / 2^60 ∈ (0, 1] — i.e. w * 2^60 / h,
    computed in double space (IEEE-exact same result on any engine)."""
    return weight * F.lit(float(HASH_SPACE)) / _element_hash(id_col)


def priority_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    *,
    k: int,
) -> DataFrame:
    """Top-k-by-priority sample per group, with the (k+1)-th priority
    as the estimation threshold τ on every sampled row.

    Scale shape: one window rank per group ordered by priority — a
    per-group sort whose cost is independent across groups, the same
    shape as W2 best-per-key. Groups smaller than k+1 get τ = 0:
    every row sampled, estimator exact.
    """
    w = Window.partitionBy("g").orderBy(
        F.desc("priority"), F.asc("id")
    )
    ranked = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(id_col).alias("id"),
            F.col(weight_col).cast("double").alias("wt"),
            _priority(
                F.col(weight_col).cast("double"), F.col(id_col)
            ).alias("priority"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("tau", F.lead("priority", k).over(w))
    )
    # tau is only defined on row 1 (lead k from row 1 = row k+1);
    # spread it to the whole sample via a per-group max
    tau = Window.partitionBy("g")
    return (
        ranked.withColumn("tau", F.max(F.when(F.col("rn") == 1, F.coalesce(F.col("tau"), F.lit(0.0)))).over(tau))
        .where(F.col("rn") <= k)
        .select(
            F.col("g").alias(group_col),
            F.col("id").alias(id_col),
            F.col("wt").alias(weight_col),
            "priority",
            "tau",
        )
    )


def priority_sum_estimate(
    sample: DataFrame, group_col: str, weight_col: str
) -> DataFrame:
    """Unbiased per-group total-weight estimate from a priority
    sample: ``sum(max(w, τ))``."""
    return sample.groupBy(group_col).agg(
        F.round(F.sum(F.greatest(F.col(weight_col), F.col("tau"))), 4).alias(
            "est_total_weight"
        ),
        F.count(F.lit(1)).alias("sample_size"),
    )


def token_budget_select(
    docs: DataFrame,
    *,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    quality_col: str | None = None,
) -> DataFrame:
    """Select documents per group, best-first, until each group's
    running token total reaches ``budget_tokens``.

    The classic "fill the mixture" step: order each domain's docs by
    quality (descending; ties broken by id for determinism), admit
    docs while the *previous* cumulative total is under budget — so
    the doc that crosses the line is still admitted and every group
    reaches ≥ budget (when it has enough tokens), matching how
    training mixtures overshoot then truncate at the shard level.

    Scale: a per-group cumulative-sum window — the same pre-sharded
    shape as textprep.pack_context_windows (see its docstring for the
    giant-group note).
    """
    order_expr = (
        [F.desc(quality_col), F.asc(id_col)]
        if quality_col is not None
        else [F.asc(id_col)]
    )
    w = Window.partitionBy(group_col).orderBy(*order_expr)
    return (
        docs.withColumn("cum_tokens", F.sum(token_col).over(w))
        .where(F.col("cum_tokens") - F.col(token_col) < budget_tokens)
        .select(group_col, id_col, token_col, "cum_tokens")
    )


def negative_samples(
    anchors: DataFrame,
    item_col: str,
    class_col: str,
    *,
    k: int = 4,
    seed: int = 17,
    pool: DataFrame | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training:
    for each anchor item, ``k`` items from OTHER classes —
    ``(anchor, negative, neg_rank 1..k)``.

    The classic implementation draws rand() negatives per anchor —
    irreproducible across layouts and a full shuffle of the item
    table per epoch. Here each anchor's negatives are the k smallest
    ``md5(seed, anchor, candidate)`` values among out-of-class
    candidates, which is (a) layout-independent, (b) a per-anchor
    uniform sample without replacement, and (c) re-derivable for any
    single anchor without touching the corpus (auditable lineage).

    ``pool`` is the candidate relation (same ``item_col``/
    ``class_col`` schema); default is the anchors themselves.
    Scale contract: anchors × pool is the join size — callers keep
    the pool BOUNDED (in-batch negatives, a per-class hash-ranked
    head, a reservoir), which is standard contrastive practice; the
    rank is a per-anchor window over k·|pool| candidate rows, never
    a global sort.
    """
    if pool is None:
        pool = anchors
    a = anchors.select(
        F.col(item_col).alias("anchor"), F.col(class_col).alias("a_cls")
    )
    c = pool.select(
        F.col(item_col).alias("negative"), F.col(class_col).alias("n_cls")
    )
    scored = a.join(c, F.col("a_cls") != F.col("n_cls")).withColumn(
        "h",
        _element_hash(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col("anchor").cast("string"),
                F.col("negative").cast("string"),
            )
        ),
    )
    # ordering by the raw 60-bit hash IS ordering by u = h / 2^60
    w = Window.partitionBy("anchor").orderBy("h", "negative")
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k)
        .select(
            "anchor",
            "negative",
            F.col("neg_rank").cast("int").alias("neg_rank"),
        )
    )
