"""End-to-end corpus curation: the full raw-corpus → training-corpus
flow, composed from the engine's curation operators.

    quality gate → exact dedup → near-dup clustering → decontamination

Each stage is an independently oracle-verified operator (see
queries/corpus_quality.py, queries/llm_ops.py, queries/llm_scale.py,
queries/pipeline_ops.py); this module is the composition a real
training-data pipeline runs, with one deterministic keep/drop policy
throughout (smallest doc id survives).

Scale shape: stages communicate by doc-id keep sets, never by
re-materialized text — the corpus is scanned once for features per
stage and every drop is an id anti-join (broadcast-sized relative to
the corpus: dup pairs, cluster members, and contaminated ids are all
small by construction). No stage uses rand(), a window over the whole
corpus, or a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.caching import CacheScope, active_scope
from ccgp_data_wrangling_spark.operators.components import neardup_clusters
from ccgp_data_wrangling_spark.operators.corpus_stats import (
    corpus_tokens,
    repetition_stats,
)
from ccgp_data_wrangling_spark.operators.dedup import ngram_jaccard_pairs
from ccgp_data_wrangling_spark.operators.textprep import contamination_pairs

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_uniq_ratio: float = 0.30,
    top_frac_max: float = 0.20,
    dup_frac_max: float = 0.60,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    contam_n: int = 5,
    contam_min_shared: int = 2,
    max_df: int | None = None,
    max_gram_df: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Run the four curation stages; return surviving docs with
    per-stage provenance.

    Output: (id, source, n_tok) of survivors. Keep policy is
    deterministic end to end: exact and near-dup families keep the
    smallest doc id; quality and contamination are pure predicates.

    ``max_df`` / ``max_gram_df`` are the document-frequency skew guards
    of the near-dup and contamination stages (see
    :func:`...dedup.ngram_jaccard_pairs` /
    :func:`...textprep.contamination_pairs`). They default to ``None``
    here — oracle-exact semantics, every gram indexed — because the e2e
    correctness contract models no caps. A production run at corpus
    scale should set them (10_000 / 1_000 are the operators' own
    standalone defaults): an n-gram shared by d docs costs d² candidate
    rows, and the only pairs a cap can lose are those sharing ONLY
    ultra-common grams, which a 0.5 Jaccard threshold rejects anyway.
    """
    if scope is None:
        scope = active_scope("curate_corpus")
    tokens = corpus_tokens(text_col)
    base = docs.select(
        id_col,
        "source",
        text_col,
        F.size(tokens).cast("long").alias("n_tok"),
        (F.size(F.array_distinct(tokens)) / F.size(tokens)).alias("__uniq"),
    )

    # 1. quality gate: length, lexical diversity, repetition spam
    rep = repetition_stats(
        docs.select(id_col, text_col),
        n=2,
        top_frac_max=top_frac_max,
        dup_frac_max=dup_frac_max,
        id_col=id_col,
        text_col=text_col,
    ).where(F.col("keep")).select(id_col)
    # persist boundaries at stage outputs: each survivor set feeds 2-3
    # downstream subtrees (its own anti-joins plus the next stage's
    # feature build); without them every stage re-derives the whole
    # upstream pipeline from the scan. At 100 TB these are the
    # checkpoints a production pipeline writes to storage.
    quality = scope.persist(
        base.where(
            (F.col("n_tok") >= min_tokens) & (F.col("__uniq") >= min_uniq_ratio)
        ).join(rep, id_col)
    )

    # 2. exact dedup: one survivor per byte-identical text —
    #    min-per-hash via aggregate (no corpus-wide window)
    canon = (
        quality.groupBy(F.md5(F.col(text_col).cast("binary")).alias("__h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    exact = scope.persist(quality.join(canon, id_col))

    # 3. near-dup: exact n-gram Jaccard pairs → components → drop
    #    non-canonical members
    pairs = ngram_jaccard_pairs(
        exact,
        id_col,
        text_col,
        n=jaccard_n,
        threshold=jaccard_threshold,
        max_df=max_df,
        scope=scope,
    )
    losers = (
        neardup_clusters(pairs)
        .where(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
    )
    deduped = scope.persist(exact.join(losers, id_col, "left_anti"))

    # 4. decontamination: drop training docs sharing n-grams with the
    #    benchmark set
    contaminated = contamination_pairs(
        deduped,
        bench,
        id_col,
        text_col,
        n=contam_n,
        min_shared=contam_min_shared,
        max_gram_df=max_gram_df,
    ).select(F.col("train_id").alias(id_col)).distinct()
    clean = deduped.join(contaminated, id_col, "left_anti")

    return clean.select(id_col, "source", "n_tok")
