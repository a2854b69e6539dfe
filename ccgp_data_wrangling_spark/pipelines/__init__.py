"""End-to-end pipelines mirroring the reference's entry points
(SURVEY.md §3), composed from the operator library. A reference user
switching engines runs these instead of the cron scripts.
"""

from ccgp_data_wrangling_spark.pipelines.metadata_ingest import (
    clean_submitted,
    run_metadata_ingest,
)
from ccgp_data_wrangling_spark.pipelines.reads_sync import run_update_reads
from ccgp_data_wrangling_spark.pipelines.sheets import (
    biosample_sheet,
    sra_sheet,
)
from ccgp_data_wrangling_spark.pipelines.summary import project_summary

__all__ = [
    "biosample_sheet",
    "clean_submitted",
    "project_summary",
    "run_metadata_ingest",
    "run_update_reads",
    "sra_sheet",
]
