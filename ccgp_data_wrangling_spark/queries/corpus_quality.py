"""Corpus-quality queries: repetition filtering, bigram-LM scoring,
TF-IDF top terms (operators/corpus_stats.py) over ``documents``.

Beyond-reference training-data-pipeline surface; each query has a
full DuckDB oracle. Float discipline: per-term logs are rounded to
6 dp on both sides BEFORE any aggregation (identical doubles in both
engines), final averages to 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.operators.corpus_stats import (
    bigram_cross_entropy,
    repetition_stats,
    tfidf_top_terms,
)
from ccgp_data_wrangling_spark.queries import register

# ---------------------------------------------------------------------------
# Gopher-style repetition filter (word-2-gram fractions + keep flag)
# ---------------------------------------------------------------------------

_REP_SQL = """
WITH toks AS (
  SELECT doc_id, LENGTH(text) AS n_chars,
         REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, n_chars,
         t[i] || ' ' || t[i + 1] AS gram
  FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t), 1))) AS u(i)
),
counts AS (
  SELECT doc_id, ANY_VALUE(n_chars) AS n_chars, gram, COUNT(*) AS cnt
  FROM grams GROUP BY doc_id, gram
),
ranked AS (
  SELECT doc_id, n_chars, gram, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram ASC) AS rk,
         SUM(CASE WHEN cnt > 1 THEN cnt * LENGTH(gram) ELSE 0 END)
           OVER (PARTITION BY doc_id) AS dup_chars
  FROM counts
),
per_doc AS (
  SELECT doc_id, n_chars, gram AS top_gram, cnt AS top_cnt, dup_chars
  FROM ranked WHERE rk = 1
)
SELECT doc_id, top_gram, CAST(top_cnt AS BIGINT) AS top_cnt,
       ROUND(CAST(top_cnt * LENGTH(top_gram) AS DOUBLE) / n_chars, 4) AS top_frac,
       ROUND(CAST(dup_chars AS DOUBLE) / n_chars, 4) AS dup_frac,
       ROUND(CAST(top_cnt * LENGTH(top_gram) AS DOUBLE) / n_chars, 4) <= 0.20
         AND ROUND(CAST(dup_chars AS DOUBLE) / n_chars, 4) <= 0.60 AS keep
FROM per_doc
"""


@register("repetition_filter_gopher", _REP_SQL)
def repetition_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, n=2)


# ---------------------------------------------------------------------------
# Bigram-LM cross entropy (bits per token, add-0.5 smoothing)
# ---------------------------------------------------------------------------

_LM_SQL = """
WITH toks AS (
  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS t FROM documents
),
pairs AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, t[i] AS w1
  FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t), 1))) AS u(i)
),
doc_bg AS (
  SELECT doc_id, bg, ANY_VALUE(w1) AS w1, COUNT(*) AS m
  FROM pairs GROUP BY doc_id, bg
),
model AS (SELECT bg, COUNT(*) AS c12 FROM pairs GROUP BY bg),
ctx   AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT UNNEST(t) AS w FROM toks)
),
scored AS (
  SELECT d.doc_id, d.m,
         ROUND(LOG2((model.c12 + 0.5) / (ctx.c1 + 0.5 * vocab.v)), 6) AS lp
  FROM doc_bg d
  JOIN model USING (bg)
  JOIN ctx ON d.w1 = ctx.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       ROUND(-SUM(m * lp) / SUM(m), 4) AS bits_per_token,
       CAST(SUM(m) AS BIGINT) AS n_bigrams
FROM scored GROUP BY doc_id
"""


@register("bigram_lm_score", _LM_SQL)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bigram_cross_entropy(docs)


# ---------------------------------------------------------------------------
# TF-IDF top-3 characteristic terms per document
# ---------------------------------------------------------------------------

_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf
  FROM (SELECT doc_id,
               UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS w
        FROM documents)
  GROUP BY doc_id, w
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n  AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ROUND(LN((n.n + 1.0) / (df.df + 1.0)) + 1.0, 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id,
       ARRAY_TO_STRING(LIST_SORT(LIST(CAST(rk AS VARCHAR) || ':' || term)), ',')
         AS top_terms,
       ROUND(MAX(score), 4) AS best_score
FROM ranked WHERE rk <= 3 GROUP BY doc_id
"""


@register("tfidf_top_terms", _TFIDF_SQL)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_k=3)


# ---------------------------------------------------------------------------
# Perplexity-curriculum mixing: quartile-bucket the corpus on
# bigram-LM bits/token and keep a deterministic per-bucket hash
# sample — 50% of the most-predictable quartile (repetitive text),
# all of the middle, 25% of the least-predictable (garbled). The
# oracle extends the bigram-LM SQL with QUANTILE_CONT cutpoints and
# the md5 keep rule.
# ---------------------------------------------------------------------------

_PPL_MIX_SQL = """
WITH toks AS (
  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS t FROM documents
),
pairs AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, t[i] AS w1
  FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t), 1))) AS u(i)
),
doc_bg AS (
  SELECT doc_id, bg, ANY_VALUE(w1) AS w1, COUNT(*) AS m
  FROM pairs GROUP BY doc_id, bg
),
model AS (SELECT bg, COUNT(*) AS c12 FROM pairs GROUP BY bg),
ctx   AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT UNNEST(t) AS w FROM toks)
),
scored AS (
  SELECT d.doc_id, d.m,
         ROUND(LOG2((model.c12 + 0.5) / (ctx.c1 + 0.5 * vocab.v)), 6) AS lp
  FROM doc_bg d
  JOIN model USING (bg)
  JOIN ctx ON d.w1 = ctx.w1
  CROSS JOIN vocab
),
ppl AS (
  SELECT doc_id, ROUND(-SUM(m * lp) / SUM(m), 4) AS bits_per_token
  FROM scored GROUP BY doc_id
),
cuts AS (
  SELECT QUANTILE_CONT(bits_per_token, 0.25) AS q1,
         QUANTILE_CONT(bits_per_token, 0.50) AS q2,
         QUANTILE_CONT(bits_per_token, 0.75) AS q3
  FROM ppl
),
bucketed AS (
  SELECT doc_id, bits_per_token,
         1 + CAST(bits_per_token > q1 AS INT)
           + CAST(bits_per_token > q2 AS INT)
           + CAST(bits_per_token > q3 AS INT) AS bucket
  FROM ppl, cuts
)
SELECT doc_id, bits_per_token, bucket,
       (CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
         % 100 < CASE bucket WHEN 1 THEN 50 WHEN 2 THEN 100
                             WHEN 3 THEN 100 ELSE 25 END AS kept
FROM bucketed
"""


@register("perplexity_bucket_mix", _PPL_MIX_SQL)
def perplexity_bucket_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum mixing by LM perplexity quartile
    (operators/textprep.quantile_bucket_sample over
    operators/corpus_stats.bigram_cross_entropy).

    Scale: the LM scoring is the dominant cost (tokenize-once persist,
    bigram-model equi-join); bucketing adds ONE scalar-subquery
    percentile and a pure projection — no NTILE, no global sort, and
    the sample is layout-independent md5, so the mixed corpus is
    reproducible bit-for-bit on any cluster.
    """
    from ccgp_data_wrangling_spark.caching import active_scope
    from ccgp_data_wrangling_spark.operators.corpus_stats import (
        bigram_cross_entropy,
    )
    from ccgp_data_wrangling_spark.operators.textprep import (
        quantile_bucket_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    # persist the scored frame: it is consumed twice (the percentile
    # scalar subquery and the bucket-assignment projection), and the
    # LM scoring behind it is the dominant cost
    scores = active_scope("perplexity_bucket_mix").persist(
        bigram_cross_entropy(docs).select("doc_id", "bits_per_token")
    )
    return quantile_bucket_sample(
        scores, "bits_per_token", [50, 100, 100, 25], key_col="doc_id"
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-shaped): deterministic
# weight table, integer-exact feature sum, 6-dp sigmoid. Oracle
# replays the weight generation and pooling arithmetic.
# ---------------------------------------------------------------------------

_CLS_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS w
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST((CAST(('0x' || SUBSTR(md5(w), 1, 15)) AS BIGINT) + 1) % 256 AS INT) AS b
  FROM toks
),
weights AS (
  SELECT CAST(r.range AS INT) AS b,
         (CAST(('0x' || SUBSTR(md5('11:' || CAST(r.range AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
           % 2001 - 1000 AS w_m
  FROM RANGE(0, 256) r
),
pooled AS (
  SELECT doc_id, ROUND(SUM(w_m) / (1000.0 * COUNT(*)), 6) AS x
  FROM feats JOIN weights USING (b) GROUP BY 1
)
SELECT doc_id, x,
       ROUND(1.0 / (1.0 + EXP(-x)), 6) AS score,
       ROUND(1.0 / (1.0 + EXP(-x)), 6) >= 0.5 AS keep
FROM pooled
"""


@register("quality_classifier_linear", _CLS_SQL)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality scoring over documents
    (operators/embed.linear_text_score).

    The weights are a deterministic stand-in for a trained fastText
    head (nothing trains offline); the Spark plumbing — explode →
    broadcast weight join → one map-side-combining aggregate → sigmoid
    threshold — is exactly the production scoring plan and carries no
    UDF.
    """
    from ccgp_data_wrangling_spark.operators.embed import linear_text_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return linear_text_score(docs, "text", ["doc_id"], dim=256, seed=11)


# ---------------------------------------------------------------------------
# Per-source quota cap: at most N docs per source, chosen by a
# deterministic hash rank (not arrival order, not doc id — so the
# kept set is unbiased w.r.t. crawl ordering and stable under
# corpus growth of OTHER sources).
# ---------------------------------------------------------------------------

_QUOTA_SQL = """
SELECT source, doc_id, CAST(rk AS INT) AS quota_rank
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (CAST(('0x' || SUBSTR(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1),
                    doc_id) AS rk
  FROM documents)
WHERE rk <= 15
"""


@register("quota_cap_per_source", _QUOTA_SQL)
def quota_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard cap of 15 docs per source via deterministic hash rank.

    The anti-monopoly lever domain mixtures need: stratified samplers
    keep proportions, a quota clamps absolute dominance. Per-source
    windows only (no global sort); a doc's rank within its source
    never changes as other sources grow.
    """
    from pyspark.sql import Window

    from ccgp_data_wrangling_spark.operators.sketches import _element_hash

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    w = Window.partitionBy("source").orderBy(
        _element_hash(
            F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))
        ),
        "doc_id",
    )
    return (
        docs.withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("quota_rank") <= 15)
        .select("source", "doc_id", F.col("quota_rank").cast("int").alias("quota_rank"))
    )


# ---------------------------------------------------------------------------
# Dataset card metrics: the release-notes numbers for a corpus drop,
# in one pass over documents (plus one tiny distinct).
# ---------------------------------------------------------------------------

_CARD_SQL = r"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars,
         LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS n_tok,
         md5(text) AS h
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS exact_dup_docs,
         CAST(MIN(n_tok) AS BIGINT) AS min_tokens,
         CAST(MAX(n_tok) AS BIGINT) AS max_tokens
  FROM t
)
SELECT 'n_docs' AS metric, n_docs AS value FROM agg
UNION ALL SELECT 'n_langs', n_langs FROM agg
UNION ALL SELECT 'n_sources', n_sources FROM agg
UNION ALL SELECT 'total_chars', total_chars FROM agg
UNION ALL SELECT 'total_tokens', total_tokens FROM agg
UNION ALL SELECT 'exact_dup_docs', exact_dup_docs FROM agg
UNION ALL SELECT 'min_tokens', min_tokens FROM agg
UNION ALL SELECT 'max_tokens', max_tokens FROM agg
"""


@register("dataset_card_metrics", _CARD_SQL)
def dataset_card_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-card numbers for the corpus — doc/lang/source counts,
    token totals, exact-dup count, length extremes — ONE aggregate
    pass (count-distincts ride Spark's expand-based multi-distinct;
    at extreme scale swap in the HLL family per SCALING.md).
    """
    from ccgp_data_wrangling_spark.operators.corpus_stats import (
        corpus_tokens,
    )

    t = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        "n_chars",
        F.size(corpus_tokens("text")).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) - F.count_distinct("h"))
        .cast("long")
        .alias("exact_dup_docs"),
        F.min("n_tok").cast("long").alias("min_tokens"),
        F.max("n_tok").cast("long").alias("max_tokens"),
    )
    metrics = [
        "n_docs", "n_langs", "n_sources", "total_chars",
        "total_tokens", "exact_dup_docs", "min_tokens", "max_tokens",
    ]
    pairs = F.array(
        *[
            F.struct(F.lit(m).alias("metric"), F.col(m).alias("value"))
            for m in metrics
        ]
    )
    return agg.select(F.explode(pairs).alias("p")).select(
        F.col("p.metric").alias("metric"), F.col("p.value").alias("value")
    )


# ---------------------------------------------------------------------------
# Classifier decile profile: the model-evaluation lift table — dock
# documents into score deciles (exact percentile cutpoints, scalar
# subquery) and profile doc length + keep share per decile.
# ---------------------------------------------------------------------------

_DECILE_SQL = """
WITH toks AS (
  SELECT doc_id, n_chars,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS w
  FROM documents
),
feats AS (
  SELECT doc_id, ANY_VALUE(n_chars) AS n_chars,
         CAST((CAST(('0x' || SUBSTR(md5(w), 1, 15)) AS BIGINT) + 1) % 256 AS INT) AS b,
         COUNT(*) AS m
  FROM toks GROUP BY doc_id, b
),
weights AS (
  SELECT CAST(r.range AS INT) AS b,
         (CAST(('0x' || SUBSTR(md5('11:' || CAST(r.range AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
           % 2001 - 1000 AS w_m
  FROM RANGE(0, 256) r
),
pooled AS (
  SELECT doc_id, ANY_VALUE(n_chars) AS n_chars,
         ROUND(SUM(m * w_m) / (1000.0 * SUM(m)), 6) AS x
  FROM feats JOIN weights USING (b) GROUP BY doc_id
),
scored AS (
  SELECT doc_id, n_chars, ROUND(1.0 / (1.0 + EXP(-x)), 6) AS score FROM pooled
),
cuts AS (
  SELECT [QUANTILE_CONT(score, 0.1), QUANTILE_CONT(score, 0.2), QUANTILE_CONT(score, 0.3), QUANTILE_CONT(score, 0.4), QUANTILE_CONT(score, 0.5), QUANTILE_CONT(score, 0.6), QUANTILE_CONT(score, 0.7), QUANTILE_CONT(score, 0.8), QUANTILE_CONT(score, 0.9)] AS qs FROM scored
),
bucketed AS (
  SELECT s.*, 1 + LEN(LIST_FILTER(c.qs, q -> q < s.score)) AS decile
  FROM scored s CROSS JOIN cuts c
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       ROUND(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS keep_share
FROM bucketed GROUP BY 1
"""


@register("classifier_decile_profile", _DECILE_SQL)
def classifier_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-decile lift table for the hashed linear classifier:
    per decile, doc counts, mean length, and keep share.

    Deciles come from ONE exact-percentile scalar subquery; bucket
    assignment counts cutpoints strictly below the score (ties land
    in the lower decile identically on both engines). The scored
    relation persists across the cutpoint and bucket passes.
    """
    from ccgp_data_wrangling_spark.caching import active_scope
    from ccgp_data_wrangling_spark.operators.embed import linear_text_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    scored = active_scope("classifier_decile_profile").persist(
        linear_text_score(docs, "text", ["doc_id"], dim=256, seed=11)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select("doc_id", "n_chars", "score")
    )
    qs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    cuts = scored.agg(F.percentile("score", qs)).scalar()
    # scalar subqueries may not appear inside higher-order functions —
    # accumulate the bucket with 9 explicit element_at comparisons
    # (same pattern as textprep.length_bucket_summary)
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + (F.element_at(cuts, i) < F.col("score")).cast("int")
    return (
        scored.withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(
                F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("keep_share"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization — checked against an INDEPENDENT
# implementation: the engine normalizes with Python's unicodedata
# (UCD), the oracle with DuckDB's nfc_normalize (ICU). NFC is
# stability-guaranteed across Unicode versions, so the two must be
# byte-identical; a planted decomposed suffix (e+COMBINING ACUTE,
# A+COMBINING GRAVE) guarantees every row actually changes.
# ---------------------------------------------------------------------------

_NFC_PLANT = "éÀ nfc"  # decomposes: é as e+́ , À as A+̀

_NFC_SQL = """
WITH planted AS (
  SELECT doc_id,
         substr(text, 1, 20) || 'e' || chr(769) || 'A' || chr(768)
           || ' nfc' AS raw
  FROM documents
)
SELECT doc_id,
       nfc_normalize(raw) AS norm_text,
       CAST(length(raw) AS INT) AS len_before,
       CAST(length(nfc_normalize(raw)) AS INT) AS len_after
FROM planted
"""


@register("unicode_nfc_normalize", _NFC_SQL)
def unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization end-to-end: planted combining sequences →
    Arrow unicodedata kernel (functions/unicode_norm.nfc_normalize)
    vs DuckDB's ICU normalizer. Combining marks collapse, so
    len_after < len_before on every row."""
    from ccgp_data_wrangling_spark.functions.unicode_norm import (
        nfc_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.substring("text", 1, 20), F.lit(_NFC_PLANT)
    )
    norm = nfc_normalize(raw)
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(raw).alias("len_before"),
        F.length(norm).alias("len_after"),
    )


# ---------------------------------------------------------------------------
# Mojibake repair — the constructed corruption is the classic
# UTF-8-bytes-read-as-cp1252 double encoding; the repair re-encodes
# through the wrong codec and decodes as UTF-8
# (functions/unicode_norm.fix_mojibake). The oracle never sees the
# corruption: it states the CLEAN text directly from the
# construction, so an under- or over-eager repair breaks the hash.
# ---------------------------------------------------------------------------

_MOJI_PRE = 'cafÃ© '    # "café " mis-decoded
_MOJI_SUF = ' naÃ¯ve â€” ok'    # " naïve — ok" mis-decoded

_MOJI_SQL = """
SELECT doc_id,
       'café ' || CAST(doc_id % 7 AS VARCHAR) || ' naïve — ok'
         AS text_fixed,
       TRUE AS was_repaired,
       CAST(20 + 1 AS INT) AS len_bad,
       CAST(16 + 1 AS INT) AS len_fixed
FROM documents
"""


@register("mojibake_repair_stats", _MOJI_SQL)
def mojibake_repair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair end-to-end: corrupted column assembled from
    pre-mangled constant fragments + a per-doc digit → Arrow repair
    kernel → clean text, flagged rows, code-point lengths both
    sides. len_bad = 6 + 1 + 14 mangled code points; len_fixed =
    5 + 1 + 11 clean ones."""
    from ccgp_data_wrangling_spark.functions.unicode_norm import (
        fix_mojibake,
    )

    docs = load_table(spark, sf_dir, "documents")
    digit = (F.col("doc_id") % 7).cast("string")
    mangled = F.concat(F.lit(_MOJI_PRE), digit, F.lit(_MOJI_SUF))
    fixed = fix_mojibake(mangled)
    return docs.select(
        "doc_id",
        fixed.alias("text_fixed"),
        (mangled != fixed).alias("was_repaired"),
        F.length(mangled).alias("len_bad"),
        F.length(fixed).alias("len_fixed"),
    )


# ---------------------------------------------------------------------------
# Hashed linear quality model (fasttext-shaped): token → md5 bucket →
# broadcast weight join → exact integer mean-pool → sigmoid. The
# model table is the deterministic fixture (bucket · 2654435761 mod
# 2001 − 1000 milli-units), replayed verbatim in SQL; keep/drop is an
# integer comparison, immune to float rounding.
# ---------------------------------------------------------------------------

_QMODEL_SQL = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS tok
  FROM documents
),
w AS (
  SELECT doc_id,
         ((CAST(('0x' || SUBSTR(md5(tok), 1, 15)) AS BIGINT) % 4096)
          * 2654435761) % 2001 - 1000 AS w_milli
  FROM toks
),
s AS (
  SELECT doc_id, COUNT(*) AS n, SUM(w_milli) AS sm
  FROM w GROUP BY doc_id
)
SELECT doc_id AS id,
       CAST(n AS INT) AS n_tokens,
       CAST(sm AS BIGINT) AS score_milli,
       ROUND(1.0 / (1.0 + EXP(-(sm / (n * 1000.0)))), 4) AS prob,
       (sm >= 0) AS keep
FROM s
"""


@register("quality_model_filter", _QMODEL_SQL)
def quality_model_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering end-to-end
    (operators/quality_model.score_documents): engine-standard
    tokenizer + md5 bucket hash, broadcast weight table, exact
    integer pooling. The 100 TB shape: a real trained model swaps in
    as the same (bucket, w_milli) broadcast table."""
    from ccgp_data_wrangling_spark.operators.quality_model import (
        hashed_weights_fixture,
        score_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights = hashed_weights_fixture(spark, 4096)
    return score_documents(docs, "doc_id", "text", weights, n_buckets=4096)
