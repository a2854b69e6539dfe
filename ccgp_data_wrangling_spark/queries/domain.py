"""Domain-operator queries: the reference's CCGP pipelines exercised
over deterministic fixtures derived from the benchmark tables, so the
driver's DuckDB oracle can check them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.operators.linkage import link_reads_to_samples
from ccgp_data_wrangling_spark.queries import register

# ---------------------------------------------------------------------------
# J1/J2/A5 linkage join, driver-checkable: samples = every 7th customer
# (id "C<custkey>"), reads = one fastq per order named
# "C<custkey>_L00<orderkey%4>_R1_001.fastq.gz". The Spark side runs the
# REAL linkage operator (candidate-span inversion, tier cascade,
# conflict window); the oracle replicates the effective join with a
# substring predicate — for this fixture every match is exact-tier and
# conflict-free, so the results must agree exactly.
# ---------------------------------------------------------------------------

_J1_SQL = """
WITH samples AS (
  SELECT c_name AS sample_name,
         'C' || CAST(c_custkey AS VARCHAR) AS id
  FROM customer WHERE c_custkey % 7 = 0
),
reads AS (
  SELECT 'C' || CAST(o_custkey AS VARCHAR) || '_O'
           || CAST(o_orderkey AS VARCHAR) || '_R1_001.fastq.gz' AS file_name,
         o_orderkey AS filesize,
         o_orderdate AS mdate
  FROM orders
)
SELECT s.sample_name,
       COUNT(*)                    AS n_files,
       CAST(SUM(r.filesize) AS BIGINT) AS filesize_sum,
       MIN(r.mdate)                AS received
FROM samples s
JOIN reads r ON CONTAINS(r.file_name, s.id || '_')
GROUP BY 1
"""


@register("j1_linkage_fileset", _J1_SQL)
def j1_linkage_fileset(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    samples = cust.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_name").alias("sample_name"),
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias(
            "minicore_seq_id"
        ),
        F.lit("YES").alias("minicore_sequenced"),
    )
    reads = orders.select(
        F.concat(
            F.lit("C"),
            F.col("o_custkey").cast("string"),
            F.lit("_O"),
            F.col("o_orderkey").cast("string"),
            F.lit("_R1_001.fastq.gz"),
        ).alias("file_name"),
        F.col("o_orderkey").alias("filesize"),
        F.col("o_orderdate").alias("mdate"),
    )
    linked = link_reads_to_samples(samples, reads)
    return linked.select(
        "sample_name",
        "n_files",
        F.col("filesize_sum").cast("long").alias("filesize_sum"),
        "received",
    )
