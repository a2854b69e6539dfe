"""The metadata-ingest pipeline — reference ``update_metadata.py``
``metadata`` subcommand (§3.2): ledger-gated per-file parse, the
X1-X6 cleaning column pipeline, the J7 species→project lookup join
with genus fallback, and the M1 upsert into ``samples``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.functions.cleaning import (
    check_date,
    check_lat,
    check_long,
    clean_name,
    dms2dd,
    scrub_sentinels,
    split_lat,
    split_long,
)
from ccgp_data_wrangling_spark.operators.merge import ParquetTable
from ccgp_data_wrangling_spark.streaming import LedgerIngest


def lookup_project(
    df: DataFrame, lookup: DataFrame, organism_col: str = "organism"
) -> DataFrame:
    """J7: organism → (ccgp_project_id, expected_species flag).

    Exact (genus, species) match first, genus-only fallback, else
    'Unknown project-id'; the flag is 1 only for the exact match —
    reference ``utils/parse.py:108-142``. The organism key is
    normalized to its first two tokens (parse.py:128-129). Both joins
    broadcast (the lookup is the 251-row CSV).
    """
    two_tok = F.concat_ws(
        " ",
        F.slice(F.split(F.trim(F.col(organism_col)), r"\s+"), 1, 2),
    )
    genus = F.split(F.trim(F.col(organism_col)), r"\s+")[0]
    exact = F.broadcast(
        lookup.select(
            F.col("genus_species").alias("__gs"),
            F.col("project_id").alias("__p_exact"),
        )
    )
    by_genus = F.broadcast(
        lookup.select(
            F.col("genus").alias("__g"), F.col("project_id").alias("__p_genus")
        ).dropDuplicates(["__g"])
    )
    out = (
        df.withColumn("__gs", two_tok)
        .withColumn("__g", genus)
        .join(exact, "__gs", "left")
        .join(by_genus, "__g", "left")
    )
    return out.withColumn(
        "ccgp_project_id",
        F.coalesce("__p_exact", "__p_genus", F.lit("Unknown project-id")),
    ).withColumn(
        "expected_species", F.col("__p_exact").isNotNull().cast("int")
    ).drop("__gs", "__g", "__p_exact", "__p_genus")


def clean_submitted(df: DataFrame, lookup: DataFrame) -> DataFrame:
    """The finalize pipeline (utils/parse.py:268-291) as pure Column
    expressions: name cleaning X5, sentinel scrub X6, coordinate
    extraction X1/X2 + sign normalization X4, date normalization X3,
    and the J7 lookup join.

    Expects raw columns: sample_name, organism, lat_lon (composite
    string; DMS handled), collection_date.
    """
    lat_lon = scrub_sentinels(F.col("lat_lon"))
    is_dms = lat_lon.rlike("[°'\"]")
    lat_raw = F.when(is_dms, dms2dd(F.substring_index(lat_lon, " ", 1))).otherwise(
        split_lat(lat_lon).try_cast("double")
    )
    long_raw = F.when(
        is_dms, dms2dd(F.substring_index(lat_lon, " ", -1))
    ).otherwise(split_long(lat_lon).try_cast("double"))
    out = (
        df.withColumn("sample_name", clean_name(F.col("sample_name")))
        .withColumn("lat", check_lat(lat_raw))
        .withColumn("long", check_long(long_raw))
        .withColumn("collection_date", check_date(scrub_sentinels(F.col("collection_date"))))
    )
    return lookup_project(out, lookup)


def run_metadata_ingest(
    spark: SparkSession,
    discovered: DataFrame,
    ledger_tbl: ParquetTable,
    samples_tbl: ParquetTable,
    lookup: DataFrame,
    read_file: Callable[[str], DataFrame],
    *,
    force: bool = False,
) -> dict[str, int]:
    """T1 ledger gate → per-file parse → clean → M1 upsert."""
    ing = LedgerIngest(spark, ledger_tbl)
    parsed, n_ok, n_failed = ing.run(discovered, read_file, force=force)
    if parsed is None:
        return {"files_ok": n_ok, "files_failed": n_failed, "rows_upserted": 0}
    cleaned = clean_submitted(parsed, lookup)
    n_rows = cleaned.count()
    samples_tbl.upsert(cleaned)
    return {"files_ok": n_ok, "files_failed": n_failed, "rows_upserted": n_rows}


def attach_accessions(
    samples_tbl: ParquetTable, attributes: DataFrame
) -> int:
    """J4 + M1: attach BioSample accessions from the NCBI round-trip
    attributes.tsv (reference ``update_metadata.py:137-151``,
    ``workflows/update_biosample_accessions.py:15-40``).

    The NCBI-side sample names arrive in pre-cleaning form — the same
    X5 cleaning is applied at join time (update_metadata.py:144-147),
    so 'HYLA 01' matches sample 'HYLA_01'. Returns rows updated.
    """
    src = attributes.select(
        clean_name(F.col("sample_name")).alias("sample_name"),
        F.col("accession").alias("ncbi_accession_id"),
        F.col("bioproject_accession").alias("ncbi_bioproject"),
    ).dropDuplicates(["sample_name"])
    n = src.join(
        samples_tbl.read().select("sample_name"), "sample_name", "left_semi"
    ).count()
    samples_tbl.update_where_in(
        src,
        {
            "ncbi_accession_id": F.col("s.ncbi_accession_id"),
            "ncbi_bioproject": F.col("s.ncbi_bioproject"),
        },
    )
    return n
