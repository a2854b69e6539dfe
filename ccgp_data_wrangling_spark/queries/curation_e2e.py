r"""The full curation pipeline as ONE driver-verified query.

pipelines/curation.curate_corpus composes four independently-verified
operators (quality gate → exact dedup → n-gram-Jaccard components →
decontamination); this oracle re-states the entire composition as a
single recursive-CTE SQL program, so the driver checks the
composition — stage interaction bugs included — not just the parts.

Benchmark split mirrors contamination_ngram_overlap: every 25th doc
is the eval set, the rest is the raw training corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.pipelines.curation import curate_corpus
from ccgp_data_wrangling_spark.queries import register

_E2E_SQL = r"""
WITH RECURSIVE train AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 25 <> 0
),
bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0
),
tok AS (
  SELECT doc_id, source, text,
         REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks
  FROM train
),
-- stage 1a: length + lexical diversity
stats AS (
  SELECT doc_id, source, text, toks,
         CAST(LEN(toks) AS BIGINT) AS n_tok,
         CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS uniq
  FROM tok
),
-- stage 1b: bigram repetition metrics (corpus_quality semantics)
bigr AS (
  SELECT doc_id, LENGTH(text) AS n_chars,
         toks[i] || ' ' || toks[i + 1] AS gram
  FROM stats, UNNEST(RANGE(1, GREATEST(LEN(toks), 1))) AS u(i)
),
bcnt AS (
  SELECT doc_id, ANY_VALUE(n_chars) AS n_chars, gram, COUNT(*) AS cnt
  FROM bigr GROUP BY doc_id, gram
),
brank AS (
  SELECT doc_id, n_chars, gram, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram ASC) AS rk,
         SUM(CASE WHEN cnt > 1 THEN cnt * LENGTH(gram) ELSE 0 END)
           OVER (PARTITION BY doc_id) AS dup_chars
  FROM bcnt
),
rep AS (
  SELECT doc_id
  FROM brank WHERE rk = 1
    AND ROUND(CAST(cnt * LENGTH(gram) AS DOUBLE) / n_chars, 4) <= 0.20
    AND ROUND(CAST(dup_chars AS DOUBLE) / n_chars, 4) <= 0.60
),
quality AS (
  SELECT s.* FROM stats s JOIN rep USING (doc_id)
  WHERE s.n_tok >= 20 AND s.uniq >= 0.30
),
-- stage 2: exact dedup, smallest id per byte-identical text
exact AS (
  SELECT q.* FROM quality q
  JOIN (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY text) k
  USING (doc_id)
),
-- stage 3: 3-gram Jaccard >= 0.5 pairs among survivors → components
gr AS (
  SELECT doc_id,
         LIST_DISTINCT(
           LIST_TRANSFORM(RANGE(GREATEST(LEN(toks) - 2, 1)),
                          i -> ARRAY_TO_STRING(toks[i + 1 : i + 3], ' '))
         ) AS grams
  FROM exact
),
sizes AS (SELECT doc_id, LEN(grams) AS n FROM gr),
gex AS (SELECT doc_id, UNNEST(grams) AS g FROM gr),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM gex a JOIN gex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM sym
  UNION
  SELECT w.node, e.b FROM reach w JOIN sym e ON w.r = e.a
),
comp AS (
  SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM reach GROUP BY node
),
deduped AS (
  SELECT e.* FROM exact e
  LEFT JOIN comp ON comp.node = e.doc_id
  WHERE comp.node IS NULL OR comp.node = comp.cluster_id
),
-- stage 4: decontamination (>= 2 shared 5-grams with any bench doc)
tg5 AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT(
           LIST_TRANSFORM(RANGE(GREATEST(LEN(toks) - 4, 1)),
                          i -> ARRAY_TO_STRING(toks[i + 1 : i + 5], ' '))
         )) AS g
  FROM deduped
),
bg5 AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT(
           LIST_TRANSFORM(
             RANGE(GREATEST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) - 4, 1)),
             i -> ARRAY_TO_STRING(
                    (REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))[i + 1 : i + 5],
                    ' '))
         )) AS g
  FROM bench
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM tg5 t JOIN bg5 b ON t.g = b.g
  GROUP BY t.doc_id, b.doc_id
  HAVING COUNT(*) >= 2
)
SELECT d.doc_id, d.source, d.n_tok
FROM deduped d
LEFT JOIN contaminated c ON c.doc_id = d.doc_id
WHERE c.doc_id IS NULL
"""


@register("curation_pipeline_e2e", _E2E_SQL)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 25 != 0).select(
        "doc_id", "source", "text"
    )
    bench = docs.where(F.col("doc_id") % 25 == 0).select("doc_id", "text")
    return curate_corpus(train, bench)


# ---------------------------------------------------------------------------
# Daily refresh end-to-end (pipelines/refresh.py): yesterday's store,
# today's batch (new docs + re-crawled near-dups + contract
# violations), one refresh, metric rows out. The oracle recomputes
# every stage: the gate predicate, the exact-Jaccard boundary dedup,
# insert-only arithmetic, and the diff counts.
# ---------------------------------------------------------------------------

_REFRESH_OFFSET = 5_000_000

_REFRESH_SQL = rf"""
WITH store AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 6 != 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + {_REFRESH_OFFSET}, text || ' zzqxj'
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 6 != 0
  UNION ALL
  SELECT doc_id + {2 * _REFRESH_OFFSET}, ''
  FROM documents WHERE doc_id % 50 = 0
),
good AS (SELECT * FROM batch WHERE TRIM(text) != ''),
s_tok AS (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS t FROM store),
g_tok AS (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS t FROM good),
s_sh AS (
  SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(GREATEST(LEN(t) - 4, 1)),
                 i -> ARRAY_TO_STRING(t[i + 1 : i + 5], ' '))) AS sh
  FROM s_tok
),
g_sh AS (
  SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(GREATEST(LEN(t) - 4, 1)),
                 i -> ARRAY_TO_STRING(t[i + 1 : i + 5], ' '))) AS sh
  FROM g_tok
),
s_ex AS (SELECT doc_id, LEN(sh) AS n, UNNEST(sh) AS s FROM s_sh),
g_ex AS (SELECT doc_id, LEN(sh) AS n, UNNEST(sh) AS s FROM g_sh),
inter AS (
  SELECT g.doc_id AS new_id, s.doc_id AS old_id,
         ANY_VALUE(g.n) AS ng, ANY_VALUE(s.n) AS ns, COUNT(*) AS ni
  FROM g_ex g JOIN s_ex s ON g.s = s.s
  GROUP BY 1, 2
),
dups AS (
  SELECT DISTINCT new_id FROM inter
  WHERE CAST(ni AS DOUBLE) / (ng + ns - ni) >= 0.7
),
m AS (
  SELECT (SELECT COUNT(*) FROM batch) AS batch_rows,
         (SELECT COUNT(*) FROM batch) - (SELECT COUNT(*) FROM good) AS gate_dropped,
         (SELECT COUNT(*) FROM dups) AS dup_dropped,
         (SELECT COUNT(*) FROM good) - (SELECT COUNT(*) FROM dups) AS inserted,
         (SELECT COUNT(*) FROM store) AS n_store
)
SELECT 'batch_rows' AS metric, CAST(batch_rows AS BIGINT) AS n FROM m
UNION ALL SELECT 'gate_dropped', CAST(gate_dropped AS BIGINT) FROM m
UNION ALL SELECT 'dup_dropped', CAST(dup_dropped AS BIGINT) FROM m
UNION ALL SELECT 'inserted', CAST(inserted AS BIGINT) FROM m
UNION ALL SELECT 'store_added', CAST(inserted AS BIGINT) FROM m
UNION ALL SELECT 'store_unchanged', CAST(n_store AS BIGINT) FROM m
"""


@register("daily_refresh_e2e", _REFRESH_SQL)
def daily_refresh_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One T+1 corpus refresh: contract gate → incremental dedup vs
    the store's signature index → insert-only MERGE → snapshot-diff
    audit (pipelines/refresh.daily_refresh). The oracle recomputes
    all four stages including the exact-Jaccard dedup boundary, so
    the composition — not just the pieces — is hash-verified.
    """
    import tempfile

    from ccgp_data_wrangling_spark.operators.merge import ParquetTable
    from ccgp_data_wrangling_spark.pipelines.refresh import daily_refresh
    from ccgp_data_wrangling_spark.queries.merge_queries import (
        _cleanup_at_exit,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store_rows = docs.where(F.col("doc_id") % 6 != 0)
    batch = (
        docs.where(F.col("doc_id") % 6 == 0)
        .unionByName(
            docs.where(
                (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 6 != 0)
            ).select(
                (F.col("doc_id") + _REFRESH_OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzqxj")).alias("text"),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 2 * _REFRESH_OFFSET).alias("doc_id"),
                F.lit("").alias("text"),
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="daily_refresh_")
    try:
        store = ParquetTable(spark, f"{tmp}/store", "doc_id")
        store.init(store_rows)
        return daily_refresh(spark, store, batch)
    finally:
        _cleanup_at_exit(tmp)
