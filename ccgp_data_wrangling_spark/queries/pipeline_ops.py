r"""Training-data pipeline stage queries (operators/textprep.py).

The corpus-to-trainer stages beyond dedup/quality: deterministic
stratified sampling, context-window packing, overlapping chunking,
PII scrubbing, sharded train-order shuffle, and benchmark
decontamination. Every query is a pure-Column composition whose
DuckDB oracle states the identical relation — the multiplicative-hash
determinism policy (textprep.mult_hash) is what makes the sampling
and shuffle queries oracle-checkable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.operators.textprep import (
    chunk_text,
    contamination_pairs,
    pack_sequences,
    stratified_sample,
    train_order,
)
from ccgp_data_wrangling_spark.queries import register

# mult_hash in SQL: ((key % 2^31) * A) % 2^32 — all BIGINT-safe.
_HASH_A = "(((doc_id % 2147483648) * 2654435761) % 4294967296)"
_HASH_B = "(((doc_id % 2147483648) * 2246822519) % 4294967296)"


# ---------------------------------------------------------------------------
# Stratified sampling: down-sample dominant languages (en 40%, fr 70%),
# keep the rest. Pure deterministic filter — rerun reselects the same
# rows.
# ---------------------------------------------------------------------------

_SAMPLE_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE {_HASH_A} % 100 <
      CASE lang WHEN 'en' THEN 40 WHEN 'fr' THEN 70 ELSE 100 END
"""


@register("sample_stratified_lang", _SAMPLE_SQL)
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 40, "fr": 70}, default_pct=100
    )


# ---------------------------------------------------------------------------
# Context packing: concat-and-chunk each language's doc stream into
# 512-token packs; report per-pack doc count and token mass. The
# window cumsum is per-language (parallel across langs).
# ---------------------------------------------------------------------------

_PACK_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
packed AS (
  SELECT lang, n_tok,
         CAST(FLOOR(CAST(SUM(n_tok) OVER w - n_tok AS DOUBLE) / 512) AS BIGINT)
           AS pack_id
  FROM toks
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT lang, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
FROM packed GROUP BY lang, pack_id
"""


@register("pack_context_windows", _PACK_SQL)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.functions.text import ws_token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", ws_token_count(F.col("text")).cast("long").alias("n_tok")
    )
    packed = pack_sequences(
        docs, group_col="lang", order_col="doc_id", token_col="n_tok", budget=512
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Overlapping chunking: 200-char windows every 150 chars — the
# embedding/retrieval chunker. Output is the chunk text itself so the
# hash check pins the exact window arithmetic.
# ---------------------------------------------------------------------------

_CHUNK_SQL = """
WITH n AS (
  SELECT doc_id, text,
         CAST(CEIL(CAST(GREATEST(LENGTH(text) - 200, 0) AS DOUBLE) / 150)
              AS INT) AS extra
  FROM documents
)
SELECT doc_id, i AS chunk_id,
       SUBSTR(text, CAST(i * 150 + 1 AS INT), 200) AS chunk
FROM n, UNNEST(generate_series(0, extra)) AS t(i)
"""


@register("chunk_documents_windowed", _CHUNK_SQL)
def chunk_documents_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_text(docs, "doc_id", "text", size=200, stride=150)


# ---------------------------------------------------------------------------
# PII scrub: emails/phones/card-length digit runs → typed sentinels.
# The synthetic corpus carries no PII, so the query PLANTS a
# deterministic contact block on every 10th doc (both sides build the
# identical dirty text), then verifies the scrub chain removes it:
# n_redactions counts sentinels that appeared.
# ---------------------------------------------------------------------------

_PII_SQL = r"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1 415 555 0199 card '
                        || '4111111111111111'
              ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id,
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}',
               '[PHONE]', 'g'),
             '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '[PHONE]', 'g'),
           '[0-9]{13,19}', '[NUM]', 'g') AS text
  FROM dirty
)
SELECT doc_id, text,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '\[(EMAIL|PHONE|NUM)\]')) AS BIGINT)
         AS n_redactions
FROM scrubbed
"""


@register("pii_scrub_sentinels", _PII_SQL)
def pii_scrub_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.functions.text import scrub_pii

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1 415 555 0199 card 4111111111111111"),
            ),
        ).otherwise(F.col("text")),
    )
    scrubbed = dirty.withColumn("text", scrub_pii(F.col("text")))
    return scrubbed.withColumn(
        "n_redactions",
        F.regexp_count(F.col("text"), F.lit(r"\[(EMAIL|PHONE|NUM)\]"))
        .cast("long"),
    )


# ---------------------------------------------------------------------------
# Train-order shuffle: 8 shards by one hash, intra-shard order by an
# independent hash — a reproducible global permutation with no global
# sort. row_number windows are per-shard (parallel).
# ---------------------------------------------------------------------------

_ORDER_SQL = f"""
SELECT doc_id,
       CAST({_HASH_A} % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {_HASH_A} % 8
                               ORDER BY {_HASH_B}, doc_id) - 1 AS BIGINT) AS pos
FROM documents
"""


@register("train_order_shuffle", _ORDER_SQL)
def train_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return train_order(docs, "doc_id", n_shards=8)


# ---------------------------------------------------------------------------
# Benchmark decontamination: eval set = every 25th doc; flag training
# docs sharing ≥ 2 distinct word-5-grams with any eval doc. The
# planted near-dup families in the corpus guarantee non-empty overlap.
# Inverted-index join (pairs only where a gram is shared), benchmark
# side broadcast.
# ---------------------------------------------------------------------------

_CONTAM_SQL = r"""
WITH grams AS (
  SELECT doc_id,
         LIST_DISTINCT(
           LIST_TRANSFORM(
             RANGE(GREATEST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) - 4, 1)),
             i -> ARRAY_TO_STRING(
                    (REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))[i + 1 : i + 5],
                    ' '))
         ) AS gs
  FROM documents
),
ex AS (SELECT doc_id, UNNEST(gs) AS g FROM grams)
SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM ex t JOIN ex b ON t.g = b.g
WHERE b.doc_id % 25 = 0 AND t.doc_id % 25 <> 0
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


@register("contamination_ngram_overlap", _CONTAM_SQL)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 25 == 0)
    train = docs.where(F.col("doc_id") % 25 != 0)
    return contamination_pairs(
        train, bench, "doc_id", "text", n=5, min_shared=2, max_gram_df=1000
    ).select(
        F.col("train_id"), F.col("bench_id"), F.col("n_shared").cast("long")
    )


# ---------------------------------------------------------------------------
# Weighted domain mixture with replacement: fixed source weights, a
# 500k-token budget; per-source repeat factor floor+fractional via the
# deterministic hash bucket. Up- and down-sampling from one formula.
# ---------------------------------------------------------------------------

_MIX_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
),
weighted AS (
  SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS tok,
         CASE source WHEN 'src0' THEN 6.0 WHEN 'src1' THEN 3.0
                     WHEN 'src2' THEN 1.0 ELSE 0.0 END AS w
  FROM toks GROUP BY source
),
dim AS (
  SELECT source,
         CAST(FLOOR(w / 10.0 * 500000.0 / tok) AS BIGINT) AS nfull,
         ROUND((w / 10.0 * 500000.0 / tok
                - FLOOR(w / 10.0 * 500000.0 / tok)) * 1000000, 0) AS thresh
  FROM weighted
),
copies AS (
  SELECT t.doc_id, t.source,
         d.nfull + CASE WHEN {_HASH_A} % 1000000 < d.thresh
                        THEN 1 ELSE 0 END AS n
  FROM toks t JOIN dim d USING (source)
)
SELECT doc_id, source, CAST(u.i AS BIGINT) AS copy_idx
FROM copies, UNNEST(GENERATE_SERIES(1, CAST(n AS BIGINT))) AS u(i)
WHERE n > 0
"""


@register("domain_mixture_weighted", _MIX_SQL)
def domain_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.functions.text import ws_token_count
    from ccgp_data_wrangling_spark.operators.textprep import domain_mixture

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ws_token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    return domain_mixture(
        docs, {"src0": 6.0, "src1": 3.0, "src2": 1.0}, 500_000
    ).select("doc_id", "source", F.col("copy_idx").cast("long").alias("copy_idx"))


# ---------------------------------------------------------------------------
# Length-bucketed batching: exact-quartile boundaries (scalar
# subquery), projection-only assignment, padding-waste accounting.
# ---------------------------------------------------------------------------

_BUCKET_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
q AS (
  SELECT QUANTILE_CONT(n_tok, 0.25) AS q1,
         QUANTILE_CONT(n_tok, 0.50) AS q2,
         QUANTILE_CONT(n_tok, 0.75) AS q3
  FROM toks
),
assigned AS (
  SELECT doc_id, n_tok,
         1 + CAST(n_tok > q.q1 AS INT) + CAST(n_tok > q.q2 AS INT)
           + CAST(n_tok > q.q3 AS INT) AS bucket
  FROM toks CROSS JOIN q
)
SELECT bucket, COUNT(*) AS n_docs,
       MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(MAX(n_tok) * COUNT(*) AS BIGINT) AS padded_slots,
       ROUND(CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS DOUBLE)
             / (MAX(n_tok) * COUNT(*)), 4) AS waste_ratio
FROM assigned GROUP BY bucket
"""


@register("length_bucket_batching", _BUCKET_SQL)
def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.functions.text import ws_token_count
    from ccgp_data_wrangling_spark.operators.textprep import length_bucket_summary

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count(F.col("text")).cast("long").alias("n_tok")
    )
    return length_bucket_summary(docs, n_buckets=4)
