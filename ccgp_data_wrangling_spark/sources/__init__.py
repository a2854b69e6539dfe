"""Source connectors (SURVEY.md §2.1).

Parquet/CSV/TSV are Spark-native scans (S1/S5 — predicate and
projection pushdown come from Catalyst for free). The remaining
reference sources are thin driver-side ingestion shims that land
small external listings/spreadsheets as DataFrames ("bronze"
tables); the heavy lifting downstream is always distributed.
"""

from ccgp_data_wrangling_spark.sources.ingest import (
    lookup_csv_dim,
    read_delimited,
    read_submitted_sheet,
    s3_listing_frame,
    sniff_header_row,
)

__all__ = [
    "lookup_csv_dim",
    "read_delimited",
    "read_submitted_sheet",
    "s3_listing_frame",
    "sniff_header_row",
]
