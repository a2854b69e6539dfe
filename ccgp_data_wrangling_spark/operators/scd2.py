"""SCD2 (slowly-changing-dimension type 2) snapshot maintenance.

The reference mutates attributes in place but keeps manual audit
trails (old_sample_name swap, Misc_Scripts/Mongo_Stuff/
update_sample_names.py:25-39; geo field migration,
change_field_name.py:23-31). SCD2 is the scalable generalization:
every attribute change closes the old row (``valid_to`` stamped) and
opens a new one, so any past snapshot is a filter, not a backup.

Scale: one full-outer shuffle on the key between the OPEN rows and the
change batch; closed history rows pass through untouched (no shuffle).
On partitioned storage, only open-row partitions rewrite.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    *,
    change_ts_col: str = "ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Return the next SCD2 snapshot.

    ``current`` holds the full history: open rows (``is_current`` true,
    ``valid_to`` null) and closed rows. ``changes`` has one row per key
    (latest state) with a non-null ``change_ts_col``; open rows must
    have a non-null ``valid_from_col``. Per key:

    * tracked attrs differ from the open row → close it at the change
      ts and insert the new open version;
    * equal → no-op; absent from current → plain insert.

    Null-safe comparison throughout; closed history is never touched.
    """
    out_cols = [key, *tracked, valid_from_col, valid_to_col, current_col]
    to_type = current.schema[valid_to_col].dataType

    open_rows = current.where(F.col(current_col)).select(*out_cols)
    closed_rows = current.where(~F.col(current_col)).select(*out_cols)

    o = open_rows.select(
        key,
        *[F.col(t).alias(f"__o_{t}") for t in tracked],
        F.col(valid_from_col).alias("__o_from"),
    )
    c = changes.select(
        key,
        *[F.col(t).alias(f"__c_{t}") for t in tracked],
        F.col(change_ts_col).alias("__c_ts"),
    )
    full = o.join(c, key, "full_outer")
    o_present = F.col("__o_from").isNotNull()
    c_present = F.col("__c_ts").isNotNull()
    differs = reduce(
        or_,
        [~F.col(f"__o_{t}").eqNullSafe(F.col(f"__c_{t}")) for t in tracked],
    )

    closed_now = full.where(o_present & c_present & differs).select(
        key,
        *[F.col(f"__o_{t}").alias(t) for t in tracked],
        F.col("__o_from").alias(valid_from_col),
        F.col("__c_ts").alias(valid_to_col),
        F.lit(False).alias(current_col),
    )
    opened_now = full.where(c_present & (~o_present | differs)).select(
        key,
        *[F.col(f"__c_{t}").alias(t) for t in tracked],
        F.col("__c_ts").alias(valid_from_col),
        F.lit(None).cast(to_type).alias(valid_to_col),
        F.lit(True).alias(current_col),
    )
    untouched_open = full.where(o_present & (~c_present | ~differs)).select(
        key,
        *[F.col(f"__o_{t}").alias(t) for t in tracked],
        F.col("__o_from").alias(valid_from_col),
        F.lit(None).cast(to_type).alias(valid_to_col),
        F.lit(True).alias(current_col),
    )
    return (
        closed_rows.unionByName(closed_now)
        .unionByName(opened_now)
        .unionByName(untouched_open)
    )
