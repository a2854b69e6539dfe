"""Catalog: table registry over parquet directories.

Two table families:

* **Benchmark tables** — the TPC-H-ish star schema plus ``events``,
  ``documents``, ``embeddings`` in ``/root/testdata/sf*`` (see
  TESTDATA.md). Loaded verbatim by :func:`load_tables`.

* **Domain tables** — the CCGP data model distilled from the
  reference's Mongo collections (SURVEY.md §1.2): ``samples``
  (one row per biological sample; reference `update_metadata.py:19-20`),
  ``reads`` (one row per fastq file; reference `update_reads.py:40-56`),
  plus ingest ledgers. Explicit StructTypes — the reference's
  dynamic-schema reality is handled by a curated core schema plus an
  ``attrs`` map column for the long tail (SURVEY.md §1.5).

At cluster scale, domain tables should be written partitioned by
``ccgp_project_id`` — every observed access pattern filters on project
id, sample name, or file name (SURVEY.md §4.2), so partition pruning
on project plus file-level min/max on the keys covers the workload.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BENCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark's reader
        # rejects; read nanos as long (runtime-settable conf, so this works
        # under externally-created sessions too) and truncate to micros
        # exactly as DuckDB does so oracle comparison agrees.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all benchmark tables as DataFrames (lazy — no action run)."""
    return {t: load_table(spark, sf_dir, t) for t in BENCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every benchmark table as a temp view for spark.sql."""
    for t in BENCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Domain schemas (SURVEY.md §1, FIXTURES.md)
# ---------------------------------------------------------------------------

SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("sample_name", T.StringType(), False),
        T.StructField("organism", T.StringType(), True),
        T.StructField("ccgp_project_id", T.StringType(), True),
        T.StructField("expected_species", T.IntegerType(), True),
        T.StructField("minicore_seq_id", T.StringType(), True),
        T.StructField("old_minicore_seq_id", T.StringType(), True),
        T.StructField("preferred_sequence_id", T.StringType(), True),
        T.StructField("minicore_sequenced", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("long", T.DoubleType(), True),
        T.StructField("lat_lon", T.StringType(), True),
        T.StructField("collection_date", T.StringType(), True),
        T.StructField("geo_loc_name", T.StringType(), True),
        T.StructField("locality_description", T.StringType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("files", T.ArrayType(T.StringType()), True),
        T.StructField("filesize_sum", T.LongType(), True),
        T.StructField("received", T.TimestampType(), True),
        T.StructField("ncbi_accession_id", T.StringType(), True),
        T.StructField("ncbi_bioproject", T.StringType(), True),
        T.StructField("ref_genome_accession", T.StringType(), True),
        T.StructField("project_type", T.StringType(), True),
        T.StructField("library_prep_method", T.StringType(), True),
        T.StructField("protected_coords", T.StringType(), True),
        T.StructField("exclude", T.StringType(), True),
        T.StructField("township", T.StringType(), True),
        T.StructField("range", T.StringType(), True),
        T.StructField("section", T.StringType(), True),
        T.StructField("lane_name", T.StringType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

READS_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("filesize", T.LongType(), True),
        T.StructField("mdate", T.TimestampType(), True),
        T.StructField("orphan", T.BooleanType(), True),
        T.StructField("instrument_model", T.StringType(), True),
        T.StructField("uploaded_to_NCBI", T.StringType(), True),
        T.StructField("srr_accession_id", T.StringType(), True),
        T.StructField("ncbi_bioproject", T.StringType(), True),
        T.StructField("ccgp_project_id", T.StringType(), True),
        T.StructField("sequence_length", T.LongType(), True),
        T.StructField("sample_name", T.StringType(), True),
    ]
)

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("processed_at", T.TimestampType(), True),
    ]
)

S3_LISTING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("size", T.LongType(), True),
        T.StructField("last_modified", T.TimestampType(), True),
    ]
)
