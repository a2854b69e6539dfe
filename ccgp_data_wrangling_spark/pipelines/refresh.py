"""Daily corpus refresh: gate → dedup-vs-index → insert → audit.

The T+1 loop every production corpus runs, composed from this
engine's independently-verified pieces:

1. **Contract gate** (operators/profile.check_expectations shape):
   reject batch rows violating the data contract.
2. **Incremental near-dup** (operators/dedup.
   minhash_neardup_incremental): drop batch docs that duplicate the
   EXISTING corpus — history is consulted through its signature
   index, never re-tokenized.
3. **Insert-only MERGE** (operators/merge.ParquetTable.insert_only):
   survivors land in the store; re-delivered keys never clobber.
4. **Snapshot diff audit** (operators/diff.snapshot_diff_summary):
   what actually changed, as the refresh's commit record.

The returned frame is the refresh's metrics row-set — the thing a
scheduler alerts on: ``(metric, n)``.

Scale shape: each stage is the underlying operator's (documented)
shape; stages hand off bounded id-sets (anti-join semantics), and
the only materialization is the store itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ccgp_data_wrangling_spark.caching import CacheScope, active_scope
from ccgp_data_wrangling_spark.operators.dedup import (
    minhash_index,
    minhash_neardup_incremental,
)
from ccgp_data_wrangling_spark.operators.diff import snapshot_diff_summary
from ccgp_data_wrangling_spark.operators.merge import ParquetTable

__all__ = ["daily_refresh"]


def daily_refresh(
    spark: SparkSession,
    store: ParquetTable,
    batch: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Run one refresh of ``store`` with ``batch``; returns
    ``(metric, n)`` rows: batch_rows, gate_dropped, dup_dropped,
    inserted, store_added, store_unchanged.
    """
    if scope is None:
        scope = active_scope("daily_refresh")
    # EAGER snapshot of the pre-refresh store: step 3 swaps the
    # store's directory in place, and a lazy read evaluated after
    # that swap would silently diff the new store against itself
    # (store_added = 0 — the read-own-writes hazard every
    # copy-on-write consumer must mind)
    old = store.read().localCheckpoint(eager=True)
    batch = scope.persist(batch)

    # 1. contract gate: non-empty text
    good = scope.persist(batch.where(F.trim(F.col(text_col)) != ""))
    n_batch = batch.count()
    n_good = good.count()

    # 2. near-dup vs the historical index
    index = minhash_index(old, id_col, text_col)
    dup_ids = (
        minhash_neardup_incremental(
            good, index, id_col, text_col,
            threshold=threshold, bands=32, scope=scope,
        )
        .select(F.col("new_id").alias(id_col))
        .dropDuplicates()
    )
    survivors = good.join(dup_ids, id_col, "left_anti")
    n_dup = dup_ids.count()

    # 3. insert-only merge into the store
    store.insert_only(survivors)
    new = store.read()

    # 4. audit
    diff = snapshot_diff_summary(old, new, [id_col])
    counts = {r["status"]: r["n"] for r in diff.collect()}

    rows = [
        ("batch_rows", n_batch),
        ("gate_dropped", n_batch - n_good),
        ("dup_dropped", n_dup),
        ("inserted", n_good - n_dup),
        ("store_added", counts.get("added", 0)),
        ("store_unchanged", counts.get("unchanged", 0)),
    ]
    return spark.createDataFrame(rows, "metric string, n long")
