"""Column-function library (SURVEY.md §2.7): native Spark expressions
for every scalar transform the reference implements row-at-a-time in
Python. No Python UDFs in any hot path.
"""

from ccgp_data_wrangling_spark.functions.cleaning import (
    check_date,
    check_lat,
    check_long,
    clean_name,
    dms2dd,
    fuzzy_ratio,
    impute_default,
    scrub_array,
    scrub_sentinels,
    split_lat,
    split_long,
)

__all__ = [
    "check_date",
    "check_lat",
    "check_long",
    "clean_name",
    "dms2dd",
    "fuzzy_ratio",
    "impute_default",
    "scrub_array",
    "scrub_sentinels",
    "split_lat",
    "split_long",
]
