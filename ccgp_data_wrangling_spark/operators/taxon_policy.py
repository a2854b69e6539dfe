"""Per-taxon column-set policy for sheet generation (P1).

The reference hardcodes, per (sheet_type, data_type), the Mongo
projection used to build biosample/SRA submission sheets
(create_sheets_ultimate.py:102-264). Here the same policy is DATA —
an ordered column list per (sheet_type, taxon) — applied as a
projection intersected with the frame's actual columns, the same
available-column intersection the reference applies when a field is
absent (create_sheets.py:302-309).

Pure projection: column pruning reaches the scan (Catalyst pushes the
select into the parquet ReadSchema), so an unused policy column is
never read — the 100 TB cost of a sheet export is the included
columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["SHEET_POLICY", "policy_columns", "apply_column_policy"]

# Ordered include-lists, verbatim from the reference's projections
# (create_sheets_ultimate.py:104-150 plant, :152-204 vertebrate,
# :206-245 invertebrate, :249-264 sra — "_id" is Mongo plumbing and
# has no engine counterpart). Names keep the reference's exact
# spelling, including the '*'-starred required fields and the
# vertebrate-only '*tissue' variant.
_BIOSAMPLE_PLANT = [
    "*sample_name", "sample_title", "ncbi_accession_id", "*organism",
    "isolate", "cultivar", "ecotype", "age", "dev_stage",
    "collection_date", "*geo_loc_name", "County", "State", "tissue",
    "biomaterial_provider", "cell_line", "cell_type", "collected_by",
    "culture_collection", "disease_stage", "genotype",
    "growth_protocol", "height_or_length", "isolation_source",
    "lat_lon", "phenotype", "population", "sample_type", "sex",
    "specimen_voucher", "temp", "treatment", "Locality Description",
    "description", "minicore_seq_id", "files",
]

_BIOSAMPLE_VERTEBRATE = [
    "*sample_name", "sample_title", "ncbi_accession_id", "*organism",
    "strain", "isolate", "breed", "cultivar", "ecotype", "age",
    "dev_stage", "collection_date", "*geo_loc_name", "County",
    "State", "sex", "*tissue", "biomaterial_provider", "birth_date",
    "birth_location", "breeding_history", "breeding_method",
    "cell_line", "cell_subtype", "cell_type", "collected_by",
    "culture_collection", "death_date", "disease", "disease_stage",
    "genotype", "growth_protocol", "health_state",
    "isolation_source", "lat_lon", "phenotype", "sample_type",
    "specimen_voucher", "store_cond", "stud_book_number",
    "treatment", "Locality Description", "description",
    "minicore_seq_id", "files",
]

_BIOSAMPLE_INVERTEBRATE = [
    "*sample_name", "sample_title", "ncbi_accession_id", "*organism",
    "isolate", "breed", "host", "isolation_source",
    "collection_date", "*geo_loc_name", "County", "State", "tissue",
    "age", "altitude", "biomaterial_provider", "collected_by",
    "depth", "dev_stage", "env_broad_scale", "host_tissue_sampled",
    "identified_by", "lat_lon", "sex", "specimen_voucher", "temp",
    "Locality Description", "description", "minicore_seq_id",
    "files",
]

_SRA_COMMON = [
    "ncbi_accession_id", "*sample_name", "library_ID", "*organism",
    "title", "library_strategy", "library_source",
    "library_selection", "library_layout", "platform",
    "instrument_model", "library_prep_method", "filetype", "files",
    "filename", "filename2", "filename3", "filename4",
]

SHEET_POLICY: dict[tuple[str, str], list[str]] = {
    ("biosample", "plant"): _BIOSAMPLE_PLANT,
    ("biosample", "vertebrate"): _BIOSAMPLE_VERTEBRATE,
    ("biosample", "invertebrate"): _BIOSAMPLE_INVERTEBRATE,
    # sra uses one field set for every taxon
    # (create_sheets_ultimate.py:247-264)
    ("sra", "plant"): _SRA_COMMON,
    ("sra", "vertebrate"): _SRA_COMMON,
    ("sra", "invertebrate"): _SRA_COMMON,
}

_VALID_TAXA = ("plant", "vertebrate", "invertebrate")
_VALID_SHEETS = ("biosample", "sra")


def policy_columns(
    sheet_type: str, data_type: str, available: list[str]
) -> list[str]:
    """The effective projection: policy order, intersected with the
    columns actually present (create_sheets.py:302-309)."""
    if sheet_type not in _VALID_SHEETS:
        raise ValueError(
            "Invalid sheet type input. Valid sheet type inputs include: "
            "biosample, sra"
        )
    if data_type not in _VALID_TAXA:
        raise ValueError(
            "Invalid data type input. Valid data type inputs include: "
            "plant, vertebrate, or invertebrate"
        )
    have = set(available)
    return [c for c in SHEET_POLICY[(sheet_type, data_type)] if c in have]


def apply_column_policy(
    df: DataFrame, sheet_type: str, data_type: str
) -> DataFrame:
    """Project ``df`` to the (sheet_type, data_type) policy columns."""
    cols = policy_columns(sheet_type, data_type, df.columns)
    return df.select(*[f"`{c}`" for c in cols])
