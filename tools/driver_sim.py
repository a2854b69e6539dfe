"""Driver-faithful correctness simulation.

Mirrors the round driver more closely than tests/oracle.py: runs each
registered query AND its DuckDB oracle at sf0.01, canonicalizes with a
pandas ``sort_values`` over all columns (the step that crashed
m3_array_union_pull in round 1 on unhashable list cells), and compares
row counts, schema width, and value hashes.

Usage: python tools/driver_sim.py [query ...]   (default: all oracles)
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from ccgp_data_wrangling_spark.queries import all_oracles, all_queries
from tests.oracle import duck_connection

SF_DIR = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")  # crashes on list cells

    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            return f"{v:.6f}"
        # normalize date vs timestamp rendering: Spark's toPandas keeps
        # DateType as datetime.date ("2024-01-01") while DuckDB's .df()
        # yields datetime64 ("2024-01-01 00:00:00"). The real driver
        # hash-matched cohort_weekly_retention (DATE col) in r3, so its
        # canonicalizer normalizes this split — mirror it.
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return pd.Timestamp(v).isoformat()
        return str(v)

    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(cell(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main(names):
    import ccgp_data_wrangling_spark.session as sess

    spark = sess.get_spark()
    con = duck_connection(SF_DIR)
    oracles = all_oracles()
    queries = all_queries()
    names = names or sorted(oracles)
    failures = []
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = queries[name](spark, SF_DIR)
            # toPandas(), not collect(): the driver canonicalizes the
            # Spark side through pandas/Arrow as well, so DATE renders
            # as a pandas Timestamp on BOTH sides (cohort_weekly_
            # retention's DATE column was driver-green in r3) while a
            # DuckDB HUGEINT still lands float64 vs Spark's int64 (the
            # r3 reds). Matching both coercions is what makes this sim
            # predict the driver.
            spark_pd = sdf.toPandas()
            # .df() (Arrow/pandas path) — the real driver canonicalizes
            # through pandas, where DuckDB HUGEINT coerces to float64 and
            # renders "153.000000" vs Spark's "153".  fetchall() returned
            # Python ints and hid exactly that class of mismatch in r3
            # (cms/hist/token_budget reds — see VERDICT.md "What's wrong").
            duck_pd = con.execute(oracles[name]).df()
            rows = (len(spark_pd), len(duck_pd))
            cols_ok = sorted(spark_pd.columns) == sorted(duck_pd.columns)
            hashes = (_canon(spark_pd), _canon(duck_pd))
            ok = rows[0] == rows[1] and cols_ok and hashes[0] == hashes[1]
            print(
                f"{name}: {'OK' if ok else 'MISMATCH'} rows={rows} cols_ok={cols_ok}"
                f" hash_ok={hashes[0] == hashes[1]}"
            )
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue like the driver
            print(f"{name}: ERR {type(e).__name__}: {e}")
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main(sys.argv[1:])
