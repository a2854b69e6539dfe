"""Ingestion sources.

* S3 object-listing scan (S3) — reference ``update_reads.py:24-35``,
  ``workflows/aws_checker_UCSF.py:11-27``: enumerate (key, size,
  last_modified) into a DataFrame. Here the boto3 call is a pluggable
  iterable so tests inject listings; at scale the listing itself is
  small metadata (one row per object) even for 100 TB of objects.
* Submitted-spreadsheet scan with header discovery (S4) — reference
  ``utils/parse.py:145-151`` (TSV header scan) and ``:223-236``
  (xlsx probe loop): junk preamble rows precede the real header, which
  is found by probing for a marker column (``*sample_name``). The
  sniff reads only the file head driver-side; the full parse is a
  normal ``spark.read.csv`` with ``skipRows``.
* Excel (xlsx) — parsed by the stdlib OOXML reader in ``xlsx.py``
  (zipfile + ElementTree; no openpyxl), then run through the same
  header probe loop as TSV. Legacy binary ``.xls`` still raises.
* TSV/CSV scan (S5) — ``spark.read.csv`` wrapper with the reference's
  dialect defaults (reference ``update_metadata.py:137``).
* Lookup-CSV dimension (S8) — reference ``utils/parse.py:111-121``:
  small static dimension, returned broadcast-hinted.
"""

from __future__ import annotations

from collections.abc import Iterable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ccgp_data_wrangling_spark.catalog import S3_LISTING_SCHEMA


def s3_listing_frame(
    spark: SparkSession,
    objects: Iterable[tuple[str, int, datetime]],
) -> DataFrame:
    """Land an object-store listing as a DataFrame.

    ``objects`` yields (key, size, last_modified) — the exact fields
    the reference extracts from ``bucket.objects.all()``
    (update_reads.py:24-35). In production the iterable wraps the
    paginated boto3 listing; tests pass plain lists.
    """
    rows = [(k, int(s), m) for k, s, m in objects]
    return spark.createDataFrame(rows, S3_LISTING_SCHEMA)


def sniff_header_row(
    path: str, marker: str = "*sample_name", sep: str = "\t", max_lines: int = 100
) -> int:
    """Find the 0-based line number whose fields contain ``marker``.

    Reference ``utils/parse.py:145-151`` (find_header_line_num).
    Driver-side by design: submitted spreadsheets are small per-file;
    only the head is read.
    """
    with open(path, "r", errors="ignore") as f:
        for i, line in enumerate(f):
            if i >= max_lines:
                break
            if marker in line.rstrip("\r\n").split(sep):
                return i
    raise ValueError(f"could not find header (marker {marker!r}) in {path}")


def read_delimited(
    spark: SparkSession, path: str, *, sep: str = "\t", skip_rows: int = 0
) -> DataFrame:
    """S5 TSV/CSV scan with the reference's dialect defaults.

    ``skip_rows=0`` is a distributed ``spark.read.csv`` (the hot
    path). A non-zero ``skip_rows`` falls back to a driver-side pandas
    read — Spark's CSV source has no skip-N-rows option (it silently
    ignores unknown options), and the only skipping consumers are
    per-file submitted spreadsheets, which are small by construction.
    """
    if skip_rows:
        import pandas as pd

        pdf = pd.read_csv(
            path, sep=sep, header=0, skiprows=skip_rows, dtype=str,
            encoding_errors="ignore",
        )
        return spark.createDataFrame(pdf.where(pd.notna(pdf), None))
    return (
        spark.read.option("sep", sep)
        .option("header", True)
        .option("inferSchema", False)
        .csv(path)
    )


def read_submitted_sheet(
    spark: SparkSession,
    path: str,
    *,
    marker: str = "*sample_name",
    sep: str = "\t",
) -> DataFrame:
    """S4 submitted-spreadsheet scan: header discovery + full read.

    TSV path mirrors the reference's find_header_line_num + read_csv
    (utils/parse.py:145-151, 223-236). The xlsx path runs the same
    probe loop (utils/parse.py:223-236: re-read with header=i until
    the marker column appears) over the stdlib OOXML reader — no
    openpyxl required; the legacy ``.xls`` path runs it over the
    stdlib BIFF8 reader (``xls.py``) — no xlrd required.
    """
    if path.endswith(".xls"):
        from ccgp_data_wrangling_spark.sources.xls import xls_rows

        return _sheet_rows_to_frame(spark, xls_rows(path), marker, path)
    if path.endswith(".xlsx"):
        from ccgp_data_wrangling_spark.sources.xlsx import xlsx_rows

        return _sheet_rows_to_frame(spark, xlsx_rows(path), marker, path)
    header_at = sniff_header_row(path, marker=marker, sep=sep)
    return read_delimited(spark, path, sep=sep, skip_rows=header_at)


def _sheet_rows_to_frame(
    spark: SparkSession,
    rows: list[list[str | None]],
    marker: str,
    path: str,
) -> DataFrame:
    """Shared Excel probe loop: find the marker header row, dedup
    column names pandas-style, land the remainder as a string frame."""
    header_at = next((i for i, r in enumerate(rows) if marker in r), None)
    if header_at is None:
        raise ValueError(f"could not find header (marker {marker!r}) in {path}")
    header, seen = [], {}
    for i, name in enumerate(rows[header_at]):
        base = name if name not in (None, "") else f"col{i}"
        n = seen.get(base, 0)
        seen[base] = n + 1
        header.append(base if n == 0 else f"{base}.{n}")  # pandas-style dedup
    data = [
        tuple(r[: len(header)]) + (None,) * max(0, len(header) - len(r))
        for r in rows[header_at + 1 :]
    ]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in header])
    return spark.createDataFrame(data, schema)


def lookup_csv_dim(spark: SparkSession, path: str, *, sep: str = ",") -> DataFrame:
    """S8 species→project lookup dimension, broadcast-hinted.

    The reference reloads this 251-row CSV per parse call
    (utils/parse.py:111-121); the engine loads once and broadcasts so
    every lookup join (J7) is shuffle-free.
    """
    return F.broadcast(read_delimited(spark, path, sep=sep))
