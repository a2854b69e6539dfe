"""Driver-faithful correctness simulation.

Mirrors the round driver more closely than tests/oracle.py: runs each
registered query AND its DuckDB oracle at sf0.01, canonicalizes with a
pandas ``sort_values`` over all columns (the step that crashed
m3_array_union_pull in round 1 on unhashable list cells), and compares
row counts, schema width, and value hashes.

Usage: python tools/driver_sim.py [query ...]   (default: all oracles)
"""

from __future__ import annotations

import hashlib
import math
import sys

import pandas as pd

from ccgp_data_wrangling_spark.queries import all_oracles, all_queries
from tests.oracle import duck_connection

SF_DIR = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")  # crashes on list cells

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            return f"{v:.6f}"
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
            spark_pd = pd.DataFrame(
                [tuple(r) for r in sdf.collect()], columns=sdf.columns
            )
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_pd = pd.DataFrame(rel.fetchall(), columns=duck_cols)
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
