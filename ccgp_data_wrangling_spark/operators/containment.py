"""Set-containment join: (query, doc) pairs where every query token
appears in the doc.

Boolean AND-retrieval as a JOIN — the shape behind "find documents
matching all these tags/terms" — and a different candidate-generation
family from similarity joins: containment is asymmetric, so the
classic prefix-filter trick collapses to its strongest special case:
a query's matches must all contain the query's RAREST token, so the
inverted index is probed on exactly one token per query.

Scale shape: ONE document-frequency aggregate (token → df, reused
across all queries), one equi-join of queries to the posting list of
their rarest token (candidates bounded by min-df — for realistic
Zipfian vocabularies this is the smallest possible single-token
candidate set), then an exact array-containment verify on candidates
only. No all-pairs anywhere; the df table is vocabulary-sized and
broadcasts.

The rarest-token choice tiebreaks on the token string, so candidate
generation is deterministic; the verify makes the OUTPUT exact
regardless (recall is structural: a containing doc must contain the
rarest token — no probabilistic miss, unlike LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccgp_data_wrangling_spark.operators.corpus_stats import corpus_tokens

__all__ = ["containment_join"]


def containment_join(
    queries: DataFrame,
    docs: DataFrame,
    *,
    query_id: str = "query_id",
    query_text: str = "query",
    doc_id: str = "doc_id",
    doc_text: str = "text",
) -> DataFrame:
    """``(query_id, doc_id)`` pairs with tokens(query) ⊆ tokens(doc)."""
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.array_distinct(corpus_tokens(query_text)).alias("q_toks"),
    )
    d = docs.select(
        F.col(doc_id).alias("did"),
        F.array_distinct(corpus_tokens(doc_text)).alias("d_toks"),
    )
    postings = d.select("did", F.explode("d_toks").alias("tok"))
    df_tbl = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    # rarest token per query: min_by over (df, token); tokens absent
    # from the corpus have no df row — they make the query unmatchable
    # and are kept as rarest with df 0 (posting join yields nothing,
    # which IS the correct empty result)
    q_tok = q.select("qid", "q_toks", F.explode("q_toks").alias("tok"))
    rarest = (
        q_tok.join(F.broadcast(df_tbl), "tok", "left")
        .groupBy("qid")
        .agg(
            F.min_by(
                F.col("tok"),
                F.struct(F.coalesce("df", F.lit(0)), F.col("tok")),
            ).alias("tok"),
            F.any_value("q_toks").alias("q_toks"),
        )
    )
    cands = rarest.join(postings, "tok").select("qid", "q_toks", "did")
    return (
        cands.join(d, "did")
        .where(F.size(F.array_except("q_toks", "d_toks")) == 0)
        .select(F.col("qid").alias(query_id), F.col("did").alias(doc_id))
    )
