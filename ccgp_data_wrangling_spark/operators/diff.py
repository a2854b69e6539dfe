"""Snapshot diff: classify rows across two versions of a keyed table.

Dataset versioning for a training-data pipeline: given yesterday's
snapshot and today's, emit per-key status — ``added`` (key only in
new), ``removed`` (key only in old), ``changed`` (key in both,
content differs), ``unchanged`` — plus a summary rollup. This is the
read side of the engine's MERGE family (operators/merge.py writes
upserts; this audits what a refresh actually did), and the input to
incremental downstream recomputes: only ``added``/``changed`` keys
need re-embedding/re-scoring.

Content comparison is an md5 over the canonical string form of the
compared columns (null → a reserved sentinel, joined with an
unlikely separator), so wide rows compare with one fixed-width value
and the diff join carries 2 longs + a 32-char hash per row, not the
payload.

Scale shape: ONE full outer join, hash-partitioned on the key — the
minimum possible data motion for a diff (both sides shuffle once; at
100 TB co-locate by bucketing both snapshots on the key, which makes
the exchange a zero-shuffle sort-merge). No window, no collect, no
skew risk beyond the key's own distribution.

Reference parity: the reference's mongo upserts (utils/db.py
update_many paths) overwrite in place and keep no audit trail; this
operator is the beyond-reference versioned-dataset answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["content_hash", "snapshot_diff", "snapshot_diff_summary"]

#: separator/sentinel for the canonical row form. U+001F (unit
#: separator) never appears in real text columns.
_SEP = "\u001f"
_NULL = "\u001enull"


def content_hash(cols: list[str]) -> F.Column:
    """md5 over the canonical concatenation of ``cols``: each value's
    string form, nulls mapped to a reserved sentinel, joined on
    U+001F. DuckDB replay:
    ``md5(concat_ws(chr(31), COALESCE(CAST(c AS VARCHAR), <sentinel>), ...))``
    — concat_ws would silently SKIP nulls (conflating NULL with
    absence), hence the explicit coalesce per column.
    """
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff of two snapshots: ``keys + [status]``.

    ``compare_cols`` defaults to every shared non-key column. Rows
    are matched by full outer join on ``keys``; presence is detected
    with a literal marker column on each side (NOT by null-ness of a
    payload column, which would misclassify legitimately-null rows).
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(
        *keys,
        content_hash(compare_cols).alias("__h_old"),
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *keys,
        content_hash(compare_cols).alias("__h_new"),
        F.lit(1).alias("__in_new"),
    )
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "changed")
        .otherwise("unchanged")
    )
    return o.join(n, keys, "full_outer").select(*keys, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Status → row-count rollup of :func:`snapshot_diff`."""
    return (
        snapshot_diff(old, new, keys, compare_cols=compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
