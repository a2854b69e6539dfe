"""Deterministic CCGP-shaped fixtures (FIXTURES.md schemas).

Small but branch-complete: multi-id samples, separator variants,
conflict files, orphans, ``""``/``"NaN"`` array pollution, protected
coordinates, raw coordinate string zoo, and lookup misses all appear.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS = datetime(2023, 5, 1, 12, 0, 0)


def species_lookup(spark: SparkSession) -> DataFrame:
    rows = [
        ("12-Hyla", "Hyla", "Hyla regilla"),
        ("7-Rana", "Rana", "Rana draytonii"),
        ("93-Brachycybe", "Brachycybe", "Brachycybe lecontii"),
        ("55-Sebastes", "Sebastes", "Sebastes mystinus"),
    ]
    return spark.createDataFrame(
        rows, "project_id string, genus string, genus_species string"
    )


def samples(spark: SparkSession) -> DataFrame:
    """Eligible linkage samples + policy/cleaning branch coverage."""
    rows = [
        # sample_name, organism, project, seq_id, sequenced, files,
        # ncbi_acc, protected, exclude, lat, long, county, state,
        # locality, geo0, township, range, section
        ("HYLA_01", "Hyla regilla", "12-Hyla", "HYLA-01", "YES",
         None, None, "FALSE", "FALSE", 38.1, -120.2, "Marin", "California",
         None, None, "T1", "R1", "S1", "Minicore", None, None),
        ("HYLA_02", "Hyla regilla", "12-Hyla", "HYLA_02", "YES",
         ["stale.fastq.gz", "", "NaN"], None, "TRUE", "FALSE", 38.2, -120.3,
         None, "California", "Creek bank", None, "T2", "R2", "S2",
         "Minicore", None, None),
        ("RANA_01", "Rana draytonii", "7-Rana", "RANA01A,RANA01B", "YES",
         None, "SAMN001", "TRUE", "TRUE", 37.5, -119.9, "Kern", "California",
         None, "Existing loc", "T3", "R3", "S3", "Non-Minicore", None, None),
        ("BRACHY_01", "Brachycybe lecontii", "93-Brachycybe", "BR-01", "YES",
         None, None, None, None, None, None, None, None, None, None,
         None, None, None, "Non-Minicore", None, None),
        ("SEB_01", "Sebastes mystinus", "55-Sebastes", "SEB.01", "NO",
         None, None, "FALSE", "FALSE", 36.6, -121.9, None, None,
         "Kelp forest", None, None, None, None, "Non-Minicore", None, None),
        ("SEB_02", "Sebastes mystinus", "55-Sebastes", None, "YES",
         None, None, "FALSE", "FALSE", 36.7, -122.0, None, None, None,
         None, None, None, None, "Non-Minicore", None, None),
        # conflict pair: both ids are a prefix of CONF_1_* files
        ("CONF_1", "Hyla regilla", "12-Hyla", "CONF_1", "YES",
         None, None, "FALSE", "FALSE", 38.0, -120.0, None, None, None,
         None, None, None, None, "Minicore", None, None),
        ("CONF_12", "Hyla regilla", "12-Hyla", "CONF_1_2", "YES",
         None, None, "FALSE", "FALSE", 38.0, -120.0, None, None, None,
         None, None, None, None, "Minicore", None, None),
    ]
    schema = (
        "sample_name string, organism string, ccgp_project_id string, "
        "minicore_seq_id string, minicore_sequenced string, "
        "files array<string>, ncbi_accession_id string, "
        "protected_coords string, exclude string, lat double, long double, "
        "county string, state string, locality_description string, "
        "geo_loc_name string, township string, range string, section string, "
        "project_type string, filesize_sum long, received timestamp"
    )
    return (
        spark.createDataFrame(rows, schema)
        .withColumn("collection_date", F.lit("2021-03-07"))
        .withColumn("ncbi_bioproject", F.lit(None).cast("string"))
    )


def reads(spark: SparkSession) -> DataFrame:
    rows = []

    def add(name, size, uploaded=None, instrument=None):
        rows.append(
            (name, size, TS, None, instrument, uploaded, None, None, None, None, None)
        )

    # HYLA-01: underscore files only match via the '-'→'_' variant tier
    add("HYLA_01_L001_R1_001.fastq.gz", 100)
    add("HYLA_01_L001_R2_001.fastq.gz", 110)
    add("HYLA_01_L002_R1_001.fastq.gz", 120, instrument="Illumina NovaSeq X")
    add("HYLA_01_L002_R2_001.fastq.gz", 130)
    # HYLA_02: exact-tier matches + one non-gz (dropped post-tier)
    add("HYLA_02_L001_R1_001.fastq.gz", 200, uploaded="yes")
    add("HYLA_02_L001_R2_001.fastq.gz", 210)
    add("HYLA_02_L001_R1_001.fastq", 999)
    # RANA multi-id: files for both comma ids — first id wins the cascade
    add("RANA01A_L001_R1_001.fastq.gz", 300)
    add("RANA01A_L001_R2_001.fastq.gz", 310)
    add("RANA01B_L001_R1_001.fastq.gz", 320)
    # BRACHY: dash id 'BR-01'
    add("BR-01_L001_R1_001.fastq.gz", 400)
    add("BR-01_L001_R2_001.fastq.gz", 410)
    # SEB_01 not sequenced → its file must stay unlinked
    add("SEB.01_L001_R1_001.fastq.gz", 500)
    # conflict: CONF_1_2_* matches CONF_1 (span CONF_1) and CONF_12 (span CONF_1_2)
    add("CONF_1_2_L001_R1_001.fastq.gz", 600)
    add("CONF_1_2_L001_R2_001.fastq.gz", 610)
    # orphan: matches nothing
    add("ZZZ_L001_R1_001.fastq.gz", 700)
    schema = (
        "file_name string, filesize long, mdate timestamp, orphan boolean, "
        "instrument_model string, uploaded_to_NCBI string, "
        "srr_accession_id string, ncbi_bioproject string, "
        "ccgp_project_id string, sequence_length long, sample_name string"
    )
    return spark.createDataFrame(rows, schema)


def s3_listing(spark: SparkSession) -> DataFrame:
    """reads' keys plus one new object (insert case) minus one
    (missing-from-S3 case)."""
    base = [
        (r.file_name, r.filesize, TS)
        for r in reads(spark).collect()
        if r.file_name != "ZZZ_L001_R1_001.fastq.gz"
    ]
    base.append(("NEW_L001_R1_001.fastq.gz", 800, TS))
    return spark.createDataFrame(
        base, "key string, size long, last_modified timestamp"
    )


def biosample_attributes(spark: SparkSession) -> DataFrame:
    rows = [
        ("HYLA 01", "SAMN101", "PRJNA1"),  # dirty name exercises X5 at join
        ("SEB.01", "SAMN102", "PRJNA1"),
    ]
    return spark.createDataFrame(
        rows, "sample_name string, accession string, bioproject_accession string"
    )


def genome_sizes(spark: SparkSession) -> DataFrame:
    primary = [("12-Hyla", 2.1e9), ("7-Rana", None)]
    backup = [("7-Rana", 5.8e9), ("93-Brachycybe", 3.0e9)]
    p = spark.createDataFrame(primary, "project_id string, gsize double")
    b = spark.createDataFrame(backup, "project_id string, gsize double")
    return p, b
