"""BM25 full-text retrieval over the corpus tokenizer.

The retrieval side of a training-data pipeline: "find the documents
most relevant to these terms" (eval-set mining, targeted curation,
contamination triage). Classic Okapi BM25 (Robertson & Walker, with
the Lucene non-negative idf), built from the same inverted-index
relations every other text operator here uses — no new machinery.

Scale shape: the term-frequency relation is the explode →
map-side-combining groupBy; the query is a handful of literal terms,
so scoring is a semi-join of the tf relation against a broadcast-able
term list, one hash agg per doc, and a TakeOrderedAndProject top-k —
never a global sort, never a scan per term.

Determinism: ``ln`` differs by ulps across libm implementations, so
the idf is rounded to 6 dp immediately (the same mid-expression
rounding the TF-IDF operator uses, corpus_stats.py:256); all
downstream arithmetic is exact IEEE, so Spark and the DuckDB oracle
produce bit-identical scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccgp_data_wrangling_spark.operators.corpus_stats import corpus_tokens

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for literal ``query_terms``.

    ``score(d) = Σ_t idf(t) · tf / (tf + k1·(1 - b + b·|d|/avgdl))``
    with ``idf = round(ln((N - df + 0.5)/(df + 0.5) + 1), 6)``.
    Ties break on ascending id; the returned score is rounded to 4 dp.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(corpus_tokens(text_col)).alias("t")
    )
    tf = toks.groupBy("id", "t").agg(F.count(F.lit(1)).alias("tf"))
    doclen = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n")).scalar()
    avgdl = doclen.agg(F.avg("dl").alias("a")).scalar()

    terms = F.array(*[F.lit(t) for t in query_terms])
    qtf = tf.where(F.array_contains(terms, F.col("t")))
    df_ = qtf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))

    idf = F.round(
        F.log(
            (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
        6,
    )
    scored = (
        qtf.join(F.broadcast(df_.withColumn("idf", idf)), "t")
        .join(doclen, "id")
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / avgdl)
            ),
        )
        .groupBy("id")
        # order-deterministic summation: float addition isn't
        # associative, and a partition-order-dependent sum can flip a
        # 4 dp rounding boundary between runs/engines — fold the
        # contributions in term order instead (DuckDB oracle:
        # LIST_REDUCE over LIST(contrib ORDER BY t))
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("t", "contrib"))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ),
                4,
            ).alias("bm25")
        )
    )
    return (
        scored.orderBy(F.desc("bm25"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "bm25")
    )
