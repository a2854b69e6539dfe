"""Dataset-versioning queries: snapshot diff audit over documents.

The two snapshots are carved deterministically out of the documents
table (no rand(), no temp writes) so the oracle can rebuild the
identical pair of versions:

* old  = docs with doc_id % 10 != 3          (the %10==3 docs are new)
* new  = docs with doc_id % 10 != 7          (the %10==7 docs dropped)
         with text uppercased when doc_id % 10 == 5  (changed rows)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.operators.diff import snapshot_diff_summary
from ccgp_data_wrangling_spark.queries import register

# DuckDB replay of operators/diff.content_hash for the documents
# payload columns (text, lang, source, n_chars) — coalesce each to the
# U+001E-prefixed sentinel, join on U+001F, md5.
_DUCK_ROWHASH = (
    "md5(concat_ws(chr(31), "
    "COALESCE(CAST(text AS VARCHAR), chr(30) || 'null'), "
    "COALESCE(CAST(lang AS VARCHAR), chr(30) || 'null'), "
    "COALESCE(CAST(source AS VARCHAR), chr(30) || 'null'), "
    "COALESCE(CAST(n_chars AS VARCHAR), chr(30) || 'null')))"
)

_DIFF_SQL = f"""
WITH old_snap AS (
  SELECT doc_id, {_DUCK_ROWHASH} AS h
  FROM documents WHERE doc_id % 10 != 3
),
new_snap AS (
  SELECT doc_id, {_DUCK_ROWHASH.replace(
      "CAST(text AS VARCHAR)",
      "CAST(CASE WHEN doc_id % 10 = 5 THEN UPPER(text) ELSE text END AS VARCHAR)",
  )} AS h
  FROM documents WHERE doc_id % 10 != 7
),
diff AS (
  SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.h != n.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old_snap o FULL OUTER JOIN new_snap n USING (doc_id)
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM diff GROUP BY 1
"""


@register("snapshot_diff_documents", _DIFF_SQL)
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Added/removed/changed/unchanged rollup between two corpus
    snapshots (operators/diff.snapshot_diff_summary).

    Scale: one key-partitioned full outer join over fixed-width
    (key, md5) rows — payloads never shuffle. Reference parity: the
    reference's mongo upserts keep no audit trail
    (ccgp-data-wrangling utils/db.py); this is the versioned-dataset
    audit a 100 TB refresh needs before committing downstream
    recomputes.
    """
    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 10 != 3)
    new = docs.where(F.col("doc_id") % 10 != 7).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 5, F.upper(F.col("text"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff_summary(old, new, ["doc_id"])


# ---------------------------------------------------------------------------
# Small-file compaction planning (operators/compaction.py): file
# listing → cumulative-quantile byte binning per partition → merge
# groups. The listing is synthesized from orders (zero-padded paths
# so lexicographic order is deterministic on both engines);
# single-file groups are dropped (no-op rewrites are pure write
# amplification). One window sum — replayed verbatim in SQL.
# ---------------------------------------------------------------------------

_COMPACT_SQL = """
WITH f AS (
  SELECT o_orderpriority AS "partition",
         'part-' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS path,
         1000 + o_orderkey % 50000 AS bytes
  FROM orders
),
p AS (
  SELECT "partition", path, bytes,
         CAST(FLOOR(COALESCE(SUM(bytes) OVER (
                PARTITION BY "partition" ORDER BY path
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0) / 1048576.0) AS BIGINT) AS group_id
  FROM f
),
g AS (
  SELECT "partition", group_id, COUNT(*) AS n, SUM(bytes) AS gb
  FROM p GROUP BY 1, 2
)
SELECT "partition", group_id, CAST(n AS INT) AS n_files,
       CAST(gb AS BIGINT) AS group_bytes
FROM g WHERE n > 1
"""


@register("compaction_plan_files", _COMPACT_SQL)
def compaction_plan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planning end-to-end: synthesized per-partition file
    listing → plan_compaction (1 MiB target) → per-group rewrite
    schedule (n_files, group_bytes). The 100 TB shape: the listing is
    metadata-sized however big the table is; rewrites parallelize per
    group."""
    from ccgp_data_wrangling_spark.operators.compaction import (
        compaction_summary,
        plan_compaction,
    )

    orders = load_table(spark, sf_dir, "orders")
    files = orders.select(
        F.col("o_orderpriority").alias("part_key"),
        F.concat(
            F.lit("part-"),
            F.lpad(F.col("o_orderkey").cast("string"), 10, "0"),
        ).alias("path"),
        (F.lit(1000) + F.col("o_orderkey") % 50000).alias("bytes"),
    )
    planned = plan_compaction(
        files,
        partition_col="part_key",
        target_bytes=1 << 20,
    )
    return compaction_summary(planned)
