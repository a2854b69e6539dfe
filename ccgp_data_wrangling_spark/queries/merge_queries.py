"""Driver-checkable MERGE queries (SURVEY.md §2.9).

Each query runs a REAL ParquetTable maintenance cycle (init → merge →
read back) in a per-call temp directory, so the copy-on-write MERGE
machinery itself — not a simulation of it — is what the DuckDB oracle
checks. The oracle states the set-oriented equivalent (FULL/LEFT JOIN
+ COALESCE / array semantics) directly over the benchmark tables.

Array columns are sorted in the projected output: array_union's
element order is an implementation detail, membership is the
semantics (update_reads.py:255-272 "$addToSet").
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.operators.merge import (
    ParquetTable,
    PartitionedParquetTable,
)
from ccgp_data_wrangling_spark.queries import register


def _cleanup_at_exit(path: str) -> None:
    """Defer temp-dir removal to interpreter exit.

    The merged table must outlive this function: the returned DataFrame
    is LAZY, and the caller (driver / bench) collects it later. Deleting
    the backing parquet in ``finally`` forced an eager whole-table
    ``collect()`` + ``createDataFrame`` round-trip through the driver —
    a scale hazard. Session-lifetime temp dirs keep the query path fully
    distributed; the handful of sf0.01-sized dirs are reclaimed at exit.
    """
    atexit.register(shutil.rmtree, path, ignore_errors=True)

# ---------------------------------------------------------------------------
# M1 $set upsert: target = even-key customers, source = keys % 3 == 0
# with refreshed balance → overlap updated, new keys inserted, the
# rest untouched.
# ---------------------------------------------------------------------------

_M1_SQL = """
WITH target AS (
  SELECT c_custkey AS k, c_name AS name, ROUND(c_acctbal, 2) AS bal
  FROM customer WHERE c_custkey % 2 = 0
),
source AS (
  SELECT c_custkey AS k, ROUND(c_acctbal + 1000, 2) AS bal
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT COALESCE(t.k, s.k) AS k,
       t.name             AS name,
       COALESCE(s.bal, t.bal) AS bal
FROM target t FULL OUTER JOIN source s ON t.k = s.k
"""


@register("m1_upsert", _M1_SQL)
def m1_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    target = cust.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    source = cust.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") + 1000, 2).alias("bal"),
    )
    tmp = tempfile.mkdtemp(prefix="m1_upsert_")
    try:
        tbl = ParquetTable(spark, f"{tmp}/t", "k")
        tbl.init(target)
        tbl.upsert(source)
        return tbl.read()
    finally:
        _cleanup_at_exit(tmp)


# ---------------------------------------------------------------------------
# M2+M6 insert-only then delete: discovery inserts never clobber
# existing rows; the delete pass purges keys absent from the listing
# (delete_mongo_file_if_not_in_aws.py:34).
# ---------------------------------------------------------------------------

_M2_SQL = """
WITH existing AS (
  SELECT 'F' || CAST(o_orderkey AS VARCHAR) AS file_name,
         CAST(0 AS BIGINT) AS filesize
  FROM orders WHERE o_orderkey % 2 = 0
),
listing AS (
  SELECT 'F' || CAST(o_orderkey AS VARCHAR) AS file_name,
         CAST(o_orderkey AS BIGINT) AS filesize
  FROM orders WHERE o_orderkey % 3 = 0
),
after_insert AS (
  SELECT file_name, filesize FROM existing
  UNION ALL
  SELECT l.file_name, l.filesize FROM listing l
  WHERE l.file_name NOT IN (SELECT file_name FROM existing)
)
SELECT a.file_name, a.filesize
FROM after_insert a
WHERE a.file_name IN (SELECT file_name FROM listing)
"""


@register("m2_insert_only_then_delete", _M2_SQL)
def m2_insert_only_then_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fname = F.concat(F.lit("F"), F.col("o_orderkey").cast("string"))
    existing = orders.where(F.col("o_orderkey") % 2 == 0).select(
        fname.alias("file_name"), F.lit(0).cast("long").alias("filesize")
    )
    listing = orders.where(F.col("o_orderkey") % 3 == 0).select(
        fname.alias("file_name"), F.col("o_orderkey").cast("long").alias("filesize")
    )
    tmp = tempfile.mkdtemp(prefix="m2_reads_")
    try:
        tbl = ParquetTable(spark, f"{tmp}/t", "file_name")
        tbl.init(existing)
        tbl.insert_only(listing)  # M2: existing rows keep filesize=0
        missing = tbl.read().join(listing.select("file_name"), "file_name", "left_anti")
        tbl.delete_keys(missing)  # M6: purge keys absent from listing
        return tbl.read()
    finally:
        _cleanup_at_exit(tmp)


# ---------------------------------------------------------------------------
# M3+M4 array union then pull: $addToSet new file names per sample,
# then $pull one specific file from flagged samples.
# ---------------------------------------------------------------------------

_M3_SQL = """
WITH target AS (
  SELECT o_custkey AS k,
         LIST_SORT(LIST('F' || CAST(o_orderkey AS VARCHAR))
                   FILTER (WHERE o_orderkey % 2 = 0)) AS files
  FROM orders WHERE o_custkey % 5 = 0 GROUP BY o_custkey
),
source AS (
  SELECT o_custkey AS k,
         LIST_SORT(LIST('F' || CAST(o_orderkey AS VARCHAR))) AS files
  FROM orders WHERE o_custkey % 5 = 0 AND o_custkey % 2 = 0 GROUP BY o_custkey
),
merged AS (
  SELECT t.k,
         CASE WHEN s.k IS NULL THEN COALESCE(t.files, [])
              ELSE LIST_DISTINCT(COALESCE(t.files, []) || COALESCE(s.files, []))
         END AS files
  FROM target t LEFT JOIN source s ON t.k = s.k
),
pulled AS (
  SELECT k,
         CASE WHEN k % 10 = 0
              THEN LIST_FILTER(files, f -> f <> 'F' || CAST(k * 3 AS VARCHAR))
              ELSE files END AS files
  FROM merged
)
SELECT k,
       -- ARRAY_TO_STRING([]) is NULL in DuckDB; Spark array_join([]) is ''
       COALESCE(ARRAY_TO_STRING(LIST_SORT(files), ','), '') AS files,
       CAST(LEN(files) AS INT) AS n_files
FROM pulled
"""


@register("m3_array_union_pull", _M3_SQL)
def m3_array_union_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fname = F.concat(F.lit("F"), F.col("o_orderkey").cast("string"))
    base = orders.where(F.col("o_custkey") % 5 == 0).select(
        F.col("o_custkey").alias("k"), fname.alias("f"), "o_orderkey"
    )
    target = base.groupBy("k").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("o_orderkey") % 2 == 0, F.col("f")))
        ).alias("files")
    )
    source = (
        base.where(F.col("k") % 2 == 0)
        .groupBy("k")
        .agg(F.array_sort(F.collect_list("f")).alias("files"))
    )
    pulls = (
        target.select("k")
        .where(F.col("k") % 10 == 0)
        .select("k", F.concat(F.lit("F"), (F.col("k") * 3).cast("string")).alias("f"))
    )
    tmp = tempfile.mkdtemp(prefix="m3_files_")
    try:
        tbl = ParquetTable(spark, f"{tmp}/t", "k")
        tbl.init(target)
        tbl.array_union_set(source, "files")  # M3 $addToSet $each
        tbl.array_pull(pulls, "files", "f")  # M4 $pull
        # The array is projected to a sorted comma-joined STRING: the
        # driver's canonicalizer hashes scalar cells (a raw list cell is
        # unhashable), and membership — not element order — is the
        # $addToSet semantics (update_reads.py:255-272).
        out = tbl.read().select(
            "k",
            F.array_join(F.array_sort("files"), ",").alias("files"),
            F.size("files").alias("n_files"),
        )
        return out
    finally:
        _cleanup_at_exit(tmp)


# ---------------------------------------------------------------------------
# M7/SCD2: audited attribute migration as a type-2 dimension update
# (operators/scd2.py). Fixture: the customer dim as an all-open
# snapshot; one change batch moves every 5th customer's segment,
# re-asserts every 7th unchanged (no-op path), and adds new keys for
# every 11th. The oracle rebuilds the same snapshot with set logic.
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH cur AS (
  SELECT c_custkey, c_mktsegment, c_nationkey,
         TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM customer
),
chg AS (
  SELECT c_custkey, 'MOVED' AS c_mktsegment, c_nationkey,
         TIMESTAMP '2024-06-01 00:00:00' AS ts
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_nationkey,
         TIMESTAMP '2024-06-01 00:00:00'
  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 5 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEWSEG', CAST(0 AS INT),
         TIMESTAMP '2024-06-01 00:00:00'
  FROM customer WHERE c_custkey % 11 = 0
)
SELECT cur.c_custkey, cur.c_mktsegment, cur.c_nationkey,
       cur.valid_from, chg.ts AS valid_to, FALSE AS is_current
FROM cur JOIN chg ON cur.c_custkey = chg.c_custkey
WHERE cur.c_mktsegment <> chg.c_mktsegment OR cur.c_nationkey <> chg.c_nationkey
UNION ALL
SELECT chg.c_custkey, chg.c_mktsegment, chg.c_nationkey,
       chg.ts, CAST(NULL AS TIMESTAMP), TRUE
FROM chg JOIN cur ON cur.c_custkey = chg.c_custkey
WHERE cur.c_mktsegment <> chg.c_mktsegment OR cur.c_nationkey <> chg.c_nationkey
UNION ALL
SELECT cur.c_custkey, cur.c_mktsegment, cur.c_nationkey,
       cur.valid_from, CAST(NULL AS TIMESTAMP), TRUE
FROM cur LEFT JOIN chg ON cur.c_custkey = chg.c_custkey
WHERE chg.c_custkey IS NULL
   OR (cur.c_mktsegment = chg.c_mktsegment AND cur.c_nationkey = chg.c_nationkey)
UNION ALL
SELECT chg.c_custkey, chg.c_mktsegment, chg.c_nationkey,
       chg.ts, CAST(NULL AS TIMESTAMP), TRUE
FROM chg LEFT JOIN cur ON cur.c_custkey = chg.c_custkey
WHERE cur.c_custkey IS NULL
"""


@register("m7_scd2_segment_migration", _SCD2_SQL)
def m7_scd2_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.operators.scd2 import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    t0 = F.lit("2020-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("2024-06-01 00:00:00").cast("timestamp")
    current = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        t0.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    moved = cust.where(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        "c_nationkey",
        t1.alias("ts"),
    )
    noop = cust.where(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 5 != 0)
    ).select("c_custkey", "c_mktsegment", "c_nationkey", t1.alias("ts"))
    fresh = cust.where(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit(0).cast("int").alias("c_nationkey"),
        t1.alias("ts"),
    )
    changes = moved.unionByName(noop).unionByName(fresh)
    return scd2_apply(
        current,
        changes,
        "c_custkey",
        ["c_mktsegment", "c_nationkey"],
        change_ts_col="ts",
    )


# ---------------------------------------------------------------------------
# M3-struct: $addToSet of (file, count) STRUCT tuples with upsert=True
# (update_metadata.py:78-85 "Metadata recieved" on workflow_progress).
# insert_only + array_union_set compose to Mongo's upsert semantics:
# new project keys are inserted with their tuple sets, existing keys
# get the set union; element equality is full-struct equality. The
# engine carries array<struct> end-to-end; only the final projection
# flattens tuples to "file:n" strings so the driver can hash them.
# ---------------------------------------------------------------------------

_M3_STRUCT_SQL = """
WITH base AS (
  SELECT o_custkey % 50 AS p,
         'F' || CAST(o_orderkey % 97 AS VARCHAR) || ':'
             || CAST(o_orderkey % 5 AS VARCHAR) AS e
  FROM orders
),
t AS (
  SELECT p, LIST(DISTINCT e) AS entries FROM base
  WHERE p % 3 <> 2 GROUP BY p
),
s AS (
  SELECT b.p, LIST(DISTINCT b.e) AS entries
  FROM (SELECT o_custkey % 50 AS p,
               'F' || CAST(o_orderkey % 97 AS VARCHAR) || ':'
                   || CAST(o_orderkey % 5 AS VARCHAR) AS e
        FROM orders WHERE o_orderkey % 3 = 0) b
  GROUP BY b.p
),
merged AS (
  SELECT COALESCE(t.p, s.p) AS p,
         CASE WHEN t.p IS NULL THEN s.entries
              WHEN s.p IS NULL THEN t.entries
              ELSE LIST_DISTINCT(t.entries || s.entries) END AS entries
  FROM t FULL OUTER JOIN s ON t.p = s.p
)
SELECT p AS project_id,
       COALESCE(ARRAY_TO_STRING(LIST_SORT(entries), ','), '') AS entries,
       CAST(LEN(entries) AS INT) AS n_entries
FROM merged
"""


@register("m3_struct_tuple_union", _M3_STRUCT_SQL)
def m3_struct_tuple_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tup = F.struct(
        F.concat(F.lit("F"), (F.col("o_orderkey") % 97).cast("string")).alias("file"),
        (F.col("o_orderkey") % 5).cast("int").alias("n"),
    )
    base = orders.select((F.col("o_custkey") % 50).alias("p"), tup.alias("e"))
    target = (
        base.where(F.col("p") % 3 != 2)
        .groupBy("p")
        .agg(F.collect_set("e").alias("entries"))
    )
    source = (
        orders.where(F.col("o_orderkey") % 3 == 0)
        .select((F.col("o_custkey") % 50).alias("p"), tup.alias("e"))
        .groupBy("p")
        .agg(F.collect_set("e").alias("entries"))
    )
    tmp = tempfile.mkdtemp(prefix="m3s_progress_")
    try:
        tbl = ParquetTable(spark, f"{tmp}/t", "p")
        tbl.init(target)
        tbl.insert_only(source)  # upsert=True: new projects inserted
        tbl.array_union_set(source, "entries")  # $addToSet on structs
        return tbl.read().select(
            F.col("p").alias("project_id"),
            F.array_join(
                F.array_sort(
                    F.transform(
                        "entries",
                        lambda e: F.concat(
                            e["file"], F.lit(":"), e["n"].cast("string")
                        ),
                    )
                ),
                ",",
            ).alias("entries"),
            F.size("entries").alias("n_entries"),
        )
    finally:
        _cleanup_at_exit(tmp)


# ---------------------------------------------------------------------------
# M8: partition-pruned MERGE — the 100 TB path. The table is hive-
# partitioned on a key prefix; the upsert's source touches 2 of the 8
# partitions and only those directories are read or rewritten
# (tests/test_partitioned_merge.py pins the physical behavior; this
# query pins the results against the set-oriented oracle).
# ---------------------------------------------------------------------------

_M8_SQL = """
WITH target AS (
  SELECT CAST(o_custkey % 8 AS BIGINT) AS pk, o_orderkey AS k,
         ROUND(o_totalprice, 2) AS total
  FROM orders WHERE o_orderkey % 2 = 0
),
source AS (
  SELECT CAST(o_custkey % 8 AS BIGINT) AS pk, o_orderkey AS k,
         ROUND(o_totalprice + 1000, 2) AS total
  FROM orders WHERE o_orderkey % 3 = 0 AND o_custkey % 8 IN (1, 3)
)
SELECT COALESCE(t.pk, s.pk) AS pk,
       COALESCE(t.k, s.k)   AS k,
       COALESCE(s.total, t.total) AS total
FROM target t FULL OUTER JOIN source s ON t.pk = s.pk AND t.k = s.k
"""


@register("m8_partitioned_upsert", _M8_SQL)
def m8_partitioned_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pk = (F.col("o_custkey") % 8).cast("long").alias("pk")
    target = orders.where(F.col("o_orderkey") % 2 == 0).select(
        pk, F.col("o_orderkey").alias("k"), F.round("o_totalprice", 2).alias("total")
    )
    source = (
        orders.where(
            (F.col("o_orderkey") % 3 == 0) & (F.col("o_custkey") % 8).isin(1, 3)
        )
        .select(
            pk,
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") + 1000, 2).alias("total"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="m8_part_")
    try:
        tbl = PartitionedParquetTable(
            spark, f"{tmp}/t", ["pk", "k"], "pk", partition_type="long"
        )
        tbl.init(target)
        tbl.upsert(source)
        return tbl.read().select("pk", "k", "total")
    finally:
        _cleanup_at_exit(tmp)


# ---------------------------------------------------------------------------
# Point-in-time (as-of) join against SCD2 history: each order picks
# the segment version valid AT ITS ORDER DATE. The consumer side of
# m7's history builder — the query every SCD2 dimension exists for.
# ---------------------------------------------------------------------------

_PIT_SQL = """
WITH hist AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
         CASE WHEN c_custkey % 5 = 0 THEN TIMESTAMP '1996-06-01 00:00:00' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MOVED', TIMESTAMP '1996-06-01 00:00:00', NULL
  FROM customer WHERE c_custkey % 5 = 0
)
SELECT o.o_orderkey, h.c_mktsegment AS segment_at_order,
       CAST(o.o_orderdate >= TIMESTAMP '1996-06-01 00:00:00' AS BOOLEAN) AS after_move
FROM orders o
JOIN hist h ON h.c_custkey = o.o_custkey
           AND o.o_orderdate >= h.valid_from
           AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
"""


@register("pit_scd2_segment_at_order", _PIT_SQL)
def pit_scd2_segment_at_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to the SCD2 segment version valid at order time.

    Plan shape: the history table is dimension-sized (≤ versions ×
    customers) so it BROADCASTS; the interval predicate rides the
    broadcast hash join on the equi-key (custkey) with the validity
    window as a residual filter — never a range/cartesian join. At
    100 TB the fact side streams through unshuffled.
    """
    cust = load_table(spark, sf_dir, "customer")
    t0 = F.lit("1992-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("1996-06-01 00:00:00").cast("timestamp")
    hist = cust.select(
        "c_custkey",
        "c_mktsegment",
        t0.alias("valid_from"),
        F.when(F.col("c_custkey") % 5 == 0, t1).alias("valid_to"),
    ).unionByName(
        cust.where(F.col("c_custkey") % 5 == 0).select(
            "c_custkey",
            F.lit("MOVED").alias("c_mktsegment"),
            t1.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cond = (
        (orders.o_custkey == hist.c_custkey)
        & (orders.o_orderdate >= hist.valid_from)
        & (hist.valid_to.isNull() | (orders.o_orderdate < hist.valid_to))
    )
    return orders.join(F.broadcast(hist), cond).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment_at_order"),
        (F.col("o_orderdate") >= t1).alias("after_move"),
    )


# ---------------------------------------------------------------------------
# M9 OPTIMIZE: small-file compaction on the merge-table layer
# (ParquetTable.compact). The oracle is the IDENTITY on the
# initialized data — compaction must be byte-for-byte invisible to
# readers while collapsing the fragmented layout; the file-count
# drop itself is asserted in tests/test_compact_tables.py.
# ---------------------------------------------------------------------------

_M9_SQL = """
SELECT c_custkey AS k, c_name AS name, ROUND(c_acctbal, 2) AS bal
FROM customer WHERE c_custkey % 4 = 1
"""


@register("m9_compact_identity", _M9_SQL)
def m9_compact_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment a table across 16 files, OPTIMIZE it to one, read it
    back — results identical to never having compacted."""
    cust = load_table(spark, sf_dir, "customer")
    data = cust.where(F.col("c_custkey") % 4 == 1).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    tmp = tempfile.mkdtemp(prefix="m9_compact_")
    try:
        tbl = ParquetTable(spark, f"{tmp}/t", "k")
        tbl.init(data.repartition(16))
        stats = tbl.compact(target_bytes=1 << 30)
        assert stats["rewritten"] and stats["n_files_after"] == 1, stats
        return tbl.read()
    finally:
        _cleanup_at_exit(tmp)
