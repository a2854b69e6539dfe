"""Scale-path LLM-pipeline queries: LSH dedup, SRP-LSH ANN, multimodal
feature extraction.

Oracle strategy: LSH pipelines are checked with **planted duplicates**
— union the corpus with a perturbed/verbatim copy of itself under
shifted ids. The Spark side runs the full LSH machinery (signatures,
banding, bucket joins, verify); the oracle states the ground truth the
pipeline must recover exactly. Parameters are chosen so recall is
certain (verify step is exact) and false positives are impossible at
the checked scale (confirmed empirically; the exact-Jaccard /
exact-Hamming verify makes the outputs deterministic, not
probabilistic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.operators.dedup import (
    minhash_neardup_pairs,
    simhash_neardup_pairs,
)
from ccgp_data_wrangling_spark.operators.knn import ann_topk, brute_force_topk
from ccgp_data_wrangling_spark.operators.multimodal import extract_media_features
from ccgp_data_wrangling_spark.queries import register

_OFFSET = 1_000_000


# ---------------------------------------------------------------------------
# MinHash LSH near-dup: plant near-duplicates (one token appended) and
# require the pipeline to recover exactly the planted pairs.
# ---------------------------------------------------------------------------

# Ground truth: exact word-5-shingle Jaccard ≥ 0.7 over the planted
# corpus, computed via a shingle inverted index (the corpus contains
# NATURAL near-dup families planted by the data generator, plus our
# perturbed copies). The Spark side must recover exactly this set —
# its verify step is exact Jaccard, and the banding params make the
# (deterministic, fixed-seed) recall complete at the checked scales.
_MINHASH_SQL = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_OFFSET}, text || ' zzqxj' FROM documents
),
tok AS (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks FROM corpus),
sh AS (
  SELECT doc_id,
         LIST_DISTINCT(
           LIST_TRANSFORM(RANGE(GREATEST(LEN(toks) - 4, 1)),
                          i -> ARRAY_TO_STRING(toks[i + 1 : i + 5], ' '))
         ) AS shingles
  FROM tok
),
sizes AS (SELECT doc_id, LEN(shingles) AS n FROM sh),
ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter) >= 0.7
"""


@register("minhash_neardup_planted", _MINHASH_SQL)
def minhash_neardup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.select(
        (F.col("doc_id") + _OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzqxj")).alias("text"),
    )
    corpus = docs.unionByName(perturbed)
    # 32 bands × 2 rows: P(miss) at the 0.7 threshold ≈ (1-0.49)^32 —
    # recall is effectively certain; the exact-Jaccard verify keeps
    # precision exact, extra candidates only cost verify work
    pairs = minhash_neardup_pairs(
        corpus, "doc_id", "text", threshold=0.7, n_hashes=64, bands=32
    )
    return pairs.select(F.col("id_a"), F.col("id_b"))


# ---------------------------------------------------------------------------
# SimHash near-dup: verbatim copies → Hamming distance 0, recovered
# through the banded bucket join (not by content equality).
# ---------------------------------------------------------------------------

# Ground truth: identical token MULTISETS. SimHash banding is the
# candidate generator (recall is EXACT at hamming 0: equal multisets →
# equal simhash → every band chunk equal → always a candidate, by
# construction not probability); the query's verify step is exact bag
# equality, so precision is exact too. Hamming-0 collisions between
# merely-similar docs DO occur (simhash clusters similar inputs by
# design), which is why the verify step exists.
_SIMHASH_SQL = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_OFFSET}, text FROM documents
),
norm AS (
  SELECT doc_id, LIST_SORT(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS bag
  FROM corpus
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
FROM norm a JOIN norm b ON a.bag = b.bag AND a.doc_id < b.doc_id
"""


@register("simhash_dup_planted", _SIMHASH_SQL)
def simhash_dup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select(
        (F.col("doc_id") + _OFFSET).alias("doc_id"), F.col("text")
    )
    corpus = docs.unionByName(copies)
    pairs = simhash_neardup_pairs(corpus, "doc_id", "text", max_hamming=0)
    # exact verify: bag-of-tokens equality (simhash pruned the pair
    # space; candidates are tiny, so this join touches few rows)
    bags = corpus.select(
        "doc_id",
        F.array_sort(F.split(F.trim(F.col("text")), r"\s+")).alias("bag"),
    )
    return (
        pairs.join(bags.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("bag", "bag_a")
        .join(bags.withColumnRenamed("doc_id", "id_b"), "id_b")
        .where(F.col("bag_a") == F.col("bag"))
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# SRP-LSH ANN vs brute force: rows-only (approximate recall is
# parameter-dependent); reports per-rank agreement for inspection.
# ---------------------------------------------------------------------------


@register("ann_lsh_vs_exact", None)
def ann_lsh_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    corpus = emb.where(F.col("vec_id") != 0)
    exact = brute_force_topk(corpus, qv, 10).select(
        F.col("vec_id").alias("exact_id"), F.col("rank")
    )
    approx = ann_topk(corpus, qv, 10).select(
        F.col("vec_id").alias("ann_id"), F.col("rank")
    )
    return exact.join(approx, "rank", "left").select(
        "rank",
        "exact_id",
        "ann_id",
        (F.col("exact_id") == F.col("ann_id")).alias("agree"),
    )


# ---------------------------------------------------------------------------
# Multimodal: documents' text bytes as opaque binary payloads pushed
# through the Arrow/mapInPandas feature extractor; oracle recomputes
# the deterministic fake-decoder outputs in SQL.
# ---------------------------------------------------------------------------

_MEDIA_SQL = """
SELECT doc_id AS id,
       'text/utf8' AS media_type,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)      AS n_bytes,
       MD5(text)                                       AS content_md5,
       CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INT) AS fake_width,
       CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS INT) AS fake_height
FROM documents
"""


@register("multimodal_features", _MEDIA_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/utf8").alias("media_type"),
    )
    feats = extract_media_features(media)
    # byte_mean is engine-side only (no tractable SQL oracle) — dropped
    # from the checked projection
    return feats.select(
        "id", "media_type", "n_bytes", "content_md5", "fake_width", "fake_height"
    )
