"""DuckDB-oracle comparison harness mirroring the driver's check:
row-count + schema-width + order-insensitive value comparison with
columns sorted by name.
"""

from __future__ import annotations

import math

import duckdb

from ccgp_data_wrangling_spark.catalog import BENCH_TABLES

def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in BENCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(rows, colnames):
    """Sort columns by name, canonicalize cell values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # driver-style canonicalization: fixed decimal text
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> None:
    """Assert spark result and duckdb oracle result match."""
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _canon([tuple(r) for r in spark_rows], spark_cols)
    d = _canon(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
