"""Timestamp-type-agnostic temporal helpers.

Parquet written with ``isAdjustedToUTC=false`` (e.g. pandas/pyarrow
``timestamp[us]``) loads as TIMESTAMP_NTZ under Spark 4's default
``spark.sql.parquet.inferTimestampNTZ.enabled=true``, and Spark
forbids a direct NTZ→DOUBLE cast. Engine sessions pin the session
timezone to UTC (session.py), so routing through TIMESTAMP_LTZ is a
pure reinterpretation — identical epoch values for LTZ and NTZ inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["epoch_seconds", "ensure_ltz"]


def epoch_seconds(col: Column | str) -> Column:
    """Exact epoch seconds (microsecond precision) as DOUBLE.

    Works for TIMESTAMP_LTZ and TIMESTAMP_NTZ alike. 2020s epoch
    micros ≪ 2^53, so the double representation is exact and
    subtraction of two results is an exact micros difference.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")


def ensure_ltz(df: DataFrame, *cols: str) -> DataFrame:
    """Reinterpret TIMESTAMP_NTZ columns as TIMESTAMP_LTZ in place.

    Structured Streaming watermarks require TIMESTAMP (LTZ) event
    time — ``withWatermark`` raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    on an NTZ column. Columns already LTZ (or absent) are untouched, so
    the helper is safe to apply unconditionally before watermarking.
    """
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp_ltz"))
    return df
