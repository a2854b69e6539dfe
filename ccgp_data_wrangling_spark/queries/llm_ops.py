"""Training-data pipeline queries over `documents` / `embeddings`.

Beyond-reference operators required by BASELINE.json's north star:
exact dedup, text quality/statistics, language-ID heuristic, and
brute-force cosine top-k (the ANN baseline). The scale paths (MinHash
LSH near-dup, LSH-bucketed ANN) live in `operators/dedup.py` and
`operators/knn.py`; their queries are registered there (rows-only
checks where not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.queries import register

# ---------------------------------------------------------------------------
# Exact deduplication: content-hash groupBy, canonical row = min key.
# Scale: hash is computed map-side; shuffle keys are 128-bit digests
# (uniform, no skew); output is one row per distinct content.
# ---------------------------------------------------------------------------

_DEDUP_SQL = """
SELECT MD5(text)            AS content_hash,
       MIN(doc_id)          AS canonical_doc_id,
       COUNT(*)             AS n_copies,
       MIN(n_chars)         AS n_chars
FROM documents
GROUP BY 1
"""


@register("dedup_exact_canonical", _DEDUP_SQL)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Text statistics / quality scoring: token counts, stopword ratio, unique
# token ratio, average word length — all JVM-side Column expressions (no
# Python in the hot path).
# ---------------------------------------------------------------------------

_STATS_SQL = """
WITH base AS (
  SELECT doc_id, lang, source,
         LENGTH(text)                                          AS n_chars,
         LEN(STR_SPLIT(text, ' '))                             AS n_tokens,
         LEN(LIST_DISTINCT(STR_SPLIT(text, ' ')))              AS n_uniq_tokens,
         LEN(REGEXP_EXTRACT_ALL(text, '\\b(the|a|of|and|in)\\b')) AS n_stop
  FROM documents
)
SELECT doc_id, lang, source, n_chars,
       CAST(n_tokens AS BIGINT)                              AS n_tokens,
       ROUND(CAST(n_uniq_tokens AS DOUBLE) / n_tokens, 4)    AS uniq_ratio,
       ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4)           AS stopword_ratio,
       ROUND(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 4) AS avg_word_len
FROM base
"""


@register("text_quality_stats", _STATS_SQL)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_uniq_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a|of|and|in)\b")).alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_uniq_tokens").cast("double") / F.col("n_tokens"), 4).alias(
            "uniq_ratio"
        ),
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 4).alias(
            "stopword_ratio"
        ),
        F.round(
            (F.col("n_chars") - (F.col("n_tokens") - 1)).cast("double") / F.col("n_tokens"), 4
        ).alias("avg_word_len"),
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: stopword-profile scoring with deterministic
# argmax. (The synthetic corpus is English-vocabulary throughout, so the
# interesting part is the operator shape: N scoring expressions + greatest/
# when argmax, all codegen'd.)
# ---------------------------------------------------------------------------

_LANGID_SQL = """
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         LEN(REGEXP_EXTRACT_ALL(text, '\\b(the|of|and)\\b'))  AS score_en,
         LEN(REGEXP_EXTRACT_ALL(text, '\\b(der|und|die)\\b')) AS score_de,
         LEN(REGEXP_EXTRACT_ALL(text, '\\b(el|de|la)\\b'))    AS score_es
  FROM documents
),
classified AS (
  SELECT doc_id, labeled_lang,
         CASE
           WHEN score_en = 0 AND score_de = 0 AND score_es = 0 THEN 'und'
           WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
           WHEN score_de >= score_es THEN 'de'
           ELSE 'es'
         END AS predicted_lang
  FROM scored
)
SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
FROM classified GROUP BY 1, 2
"""


@register("lang_id_heuristic", _LANGID_SQL)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    score_en = F.regexp_count(F.col("text"), F.lit(r"\b(the|of|and)\b"))
    score_de = F.regexp_count(F.col("text"), F.lit(r"\b(der|und|die)\b"))
    score_es = F.regexp_count(F.col("text"), F.lit(r"\b(el|de|la)\b"))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score_en.alias("score_en"),
        score_de.alias("score_de"),
        score_es.alias("score_es"),
    )
    predicted = (
        F.when(
            (F.col("score_en") == 0) & (F.col("score_de") == 0) & (F.col("score_es") == 0),
            "und",
        )
        .when(
            (F.col("score_en") >= F.col("score_de")) & (F.col("score_en") >= F.col("score_es")),
            "en",
        )
        .when(F.col("score_de") >= F.col("score_es"), "de")
        .otherwise("es")
    )
    return (
        scored.withColumn("predicted_lang", predicted)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (ANN baseline). Query vector = vec_id 0
# (driver-side point lookup → 64 literals → broadcast into codegen'd
# expressions; no Python UDF). The LSH-bucketed scale path is
# operators/knn.py.
# Scale: embarrassingly parallel scan; top-k via rank over a single
# ordered reduction of ≤k·partitions candidates.
# ---------------------------------------------------------------------------

_KNN_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id, e.label,
         ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rn FROM scored
) WHERE rn <= 10
"""


@register("knn_top10_cosine", _KNN_SQL)
def knn_top10_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    q = F.array(*[F.lit(x) for x in qv])  # array<double> literal
    e = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(e, q, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm_e = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
    norm_q = F.sqrt(F.aggregate(q, F.lit(0.0), lambda acc, x: acc + x * x))
    scored = emb.where(F.col("vec_id") != 0).select(
        "vec_id",
        "label",
        F.round(dot / (norm_e * norm_q), 4).alias("cos_sim"),
    )
    # TakeOrderedAndProject (distributed local top-k + driver merge),
    # not a single-partition global row_number window
    return (
        scored.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish pretokenizer regex
# (functions/text.py). Both counts are single regexp passes, JVM-side.
# ---------------------------------------------------------------------------

_TOKEN_SQL = r"""
SELECT doc_id,
       CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(LENGTH(text) AS DOUBLE)
             / LEN(REGEXP_EXTRACT_ALL(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')), 4) AS chars_per_token
FROM documents
"""


@register("token_counts", _TOKEN_SQL)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.functions.text import (
        bpe_ish_token_count,
        ws_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        ws_token_count(t).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.length(t).cast("double") / bpe_ish_token_count(t), 4
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: polynomial rolling hash (Horner over char
# codes mod 2^31-1) as a cheap content fingerprint; grouped to show the
# dedup use (identical content → identical fingerprint).
# ---------------------------------------------------------------------------

_FP_SQL = """
WITH fp AS (
  SELECT doc_id,
         LIST_REDUCE(
           LIST_PREPEND(CAST(0 AS BIGINT),
             LIST_TRANSFORM(RANGE(LENGTH(text)),
                            i -> CAST(ASCII(SUBSTR(text, CAST(i+1 AS INT), 1)) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
  FROM documents
)
SELECT fingerprint, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_docs
FROM fp GROUP BY 1
"""


@register("fingerprint_rolling_hash", _FP_SQL)
def fingerprint_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.functions.text import rolling_hash

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", rolling_hash(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Set-containment join (boolean AND retrieval): queries are the
# first three tokens of every 20th document; matches are ALL docs
# containing those three words. The oracle brute-forces containment
# over every (query, doc) pair, so the rarest-token index's recall
# is part of the checked contract (operators/containment.py).
# ---------------------------------------------------------------------------

_CONTAIN_SQL = r"""
WITH q AS (
  SELECT doc_id AS query_id,
         LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')[1:3]) AS q_toks
  FROM documents WHERE doc_id % 20 = 0
),
d AS (
  SELECT doc_id,
         LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS d_toks
  FROM documents
)
SELECT q.query_id, d.doc_id
FROM q CROSS JOIN d
WHERE NOT EXISTS (
  SELECT 1 FROM UNNEST(q.q_toks) AS u(t)
  WHERE NOT LIST_CONTAINS(d.d_toks, t)
)
"""


@register("containment_join_retrieval", _CONTAIN_SQL)
def containment_join_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-retrieval as a containment join: rarest-token posting probe
    + exact verify — candidates bounded by min-df, recall structural
    (a match must contain the rarest term), verified here against a
    brute-force oracle.
    """
    from ccgp_data_wrangling_spark.operators.containment import (
        containment_join,
    )
    from ccgp_data_wrangling_spark.operators.corpus_stats import (
        corpus_tokens,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = docs.where(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(corpus_tokens("text"), 1, 3)).alias("query"),
    )
    return containment_join(queries, docs)


# ---------------------------------------------------------------------------
# C4-style line dedup with document rewrite (operators/linededup.py):
# lines = non-overlapping 8-token chunks; a line survives only at its
# globally-first (doc_id, pos) occurrence; docs are reassembled from
# kept lines in order. The oracle replays first-wins with a
# row_number window and rebuilds text with ordered string_agg.
# ---------------------------------------------------------------------------

_LINEDEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i AS pos,
         ARRAY_TO_STRING(t[i * 8 + 1 : i * 8 + 8], ' ') AS line
  FROM toks,
       UNNEST(RANGE(0, CAST(CEIL(LEN(t) / 8.0) AS BIGINT))) AS u(i)
),
ranked AS (
  SELECT doc_id, pos, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos)
           AS rn
  FROM lines
),
rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         STRING_AGG(line, ' ' ORDER BY pos) AS text_clean
  FROM ranked WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id AS id,
       COALESCE(r.text_clean, '') AS text_clean,
       CAST(CEIL(LEN(t.t) / 8.0) AS INT) AS n_lines,
       CAST(COALESCE(r.n_kept, 0) AS INT) AS n_kept
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


@register("line_dedup_firstwins", _LINEDEDUP_SQL)
def line_dedup_firstwins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup + rewrite — the C4 boilerplate scrub as
    one explode + one line-keyed window + one reassembly aggregate,
    all codegen."""
    from ccgp_data_wrangling_spark.operators.linededup import (
        dedup_lines_first_wins,
    )

    docs = load_table(spark, sf_dir, "documents")
    # hash_keys: the ownership window partitions/sorts on 8-byte
    # xxhash64(line) instead of the full line string — the keying the
    # incremental LineDedupState always uses. Same kept set (a 64-bit
    # collision, ~n²/2⁶⁵, would be needed to differ; oracle MATCH and
    # output equality vs the string-keyed form verified), measured
    # 1.57 → 1.04 s at sf0.1 (guide §2.3: narrower shuffle keys).
    return dedup_lines_first_wins(
        docs, "doc_id", "text", line_tokens=8, hash_keys=True
    )
