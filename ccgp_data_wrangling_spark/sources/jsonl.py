"""JSONL (newline-delimited JSON) source + sink — the de-facto text
corpus interchange format (every public LLM dataset ships as JSONL
shards, usually gzip- or zstd-compressed).

Design rules for 100 TB, encoded in the API:

* **Explicit schema, always.** ``spark.read.json`` without a schema
  runs a full inference pass over the corpus (double scan) and types
  drift between shards; ``read_jsonl`` therefore REQUIRES a schema.
  The one honest exception is ``infer_jsonl_schema``, which samples a
  bounded number of files for interactive exploration and says so.
* **Corrupt lines are data, not crashes.** Real crawled JSONL always
  carries a malformed tail (truncated uploads, encoding damage).
  ``read_jsonl`` reads PERMISSIVE with a ``_corrupt_record`` column
  the caller can count/quarantine; ``mode="FAILFAST"`` opts into
  hard failure for trusted pipelines.
* **Parallelism = shard files.** gzip is not splittable, so a
  .jsonl.gz corpus parallelizes per FILE — the standard layout is
  many ~100 MB–1 GB shards, which is exactly what ``write_jsonl``
  emits (one file per partition). Uncompressed JSONL splits by
  byte range like any text format.

Reference parity: cademirch/ccgp-data-wrangling exchanges records as
Mongo documents (utils/db.py); JSONL is the same record model as
files, which is what a Spark-first engine exchanges instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_jsonl", "write_jsonl", "infer_jsonl_schema"]

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    mode: str = "PERMISSIVE",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Distributed JSONL scan with a REQUIRED explicit schema (see
    module docstring). ``keep_corrupt`` appends ``_corrupt_record``
    (the raw line for rows that failed to parse, null otherwise);
    without it, unparseable rows surface as all-null records in
    PERMISSIVE mode or fail the task in FAILFAST."""
    full = schema + (f", {CORRUPT_COL} string" if keep_corrupt else "")
    reader = (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """Write JSONL shards (one file per partition). ``shards``
    repartitions first — size shards so each lands ~100 MB–1 GB
    compressed; gzip shards parallelize per file on read."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def _list_shard_files(spark: SparkSession, path: str) -> list[str]:
    """Enumerate shard files through the Hadoop FileSystem API so any
    URI scheme Spark can read (file://, s3a://, hdfs://) works, and
    recursively, so Spark-writer partition subdirectories
    (``k=v/part-*.json.gz``) are found too — a local ``pathlib`` glob
    handled neither (r6 advice). Hidden/metadata entries (``_SUCCESS``,
    dotfiles) are skipped at every level."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    # The hidden/metadata filter applies only to components BELOW the
    # listed base path — a corpus legitimately rooted under e.g.
    # /root/.cache/data or /data/_staging/corpus must not filter
    # itself out (r7 advice). The base prefix is taken from the
    # fully-qualified path so relative inputs resolve consistently.
    base = fs.makeQualified(jpath).toUri().getPath().rstrip("/")
    out: list[str] = []
    it = fs.listFiles(jpath, True)  # recursive over partition dirs
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        full = p.toUri().getPath()
        rel = full[len(base):] if full.startswith(base) else full
        parts = rel.split("/")
        if any(s.startswith(("_", ".")) for s in parts if s):
            continue
        out.append(p.toString())
    return sorted(out)


def infer_jsonl_schema(
    spark: SparkSession, path: str, *, sample_files: int = 4
) -> str:
    """Exploration helper: infer a schema from a BOUNDED sample of
    shard files (never the whole corpus — a full inference pass at
    100 TB is a second full scan). Returns a DDL string to paste
    into the explicit-schema call that production code must use."""
    files = _list_shard_files(spark, path)[:sample_files]
    if not files:
        raise ValueError(f"no shard files under {path}")
    schema = spark.read.json(files).schema
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in schema.fields
    )
