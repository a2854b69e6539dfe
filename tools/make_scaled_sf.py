"""Synthesize a ``factor``× scale-up of the sf0.1 test tables so the
scaling-curve harness can fit exponents on a real decade of data
(sf0.1 → ~sf1) — the sandbox ships no sf1 parquet.

Replication is ID-SHIFTED and CONTENT-PERTURBED, not naive copying:
copying rows verbatim would give every document 9 exact duplicates
and every linkage span 10× occupancy, turning linear workloads
quadratic and invalidating the fit. Per copy ``c``:

* ids shift by ``c · 10^8`` (far above every in-query planting
  constant: _OFFSET 1e6, _PLANT_BASE 2e6, hamming's +1e7);
* document text is vowel-permuted with a distinct permutation per
  copy, so shingles/spans/terms differ across copies while length,
  token count and Zipf shape are preserved;
* embeddings rotate by ``c`` positions — norms and pairwise
  geometry within a copy preserved, cross-copy directions decorrelated;
* foreign keys (orders.o_custkey) shift in lockstep with their
  dimension so join fan-outs per key are IDENTICAL to the base data.

Usage: python tools/make_scaled_sf.py [out_dir] [factor]
       (defaults: /tmp/sf_scaled 10)
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000

# ten distinct vowel permutations (identity for copy 0)
VOWELS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeoiu", "eiaou", "iueoa", "oaiue", "uoiea",
]


def copy_sql(table: str, c: int) -> str:
    src = f"'{SRC}/{table}.parquet'"
    if table == "documents":
        perm = VOWELS[c % len(VOWELS)]
        text = (
            "text" if c == 0
            else f"translate(text, 'aeiou', '{perm}')"
        )
        return (
            f"SELECT doc_id + {c * STRIDE} AS doc_id, {text} AS text, "
            f"lang, source, n_chars FROM {src}"
        )
    if table == "embeddings":
        emb = (
            "embedding" if c == 0
            else f"list_concat(embedding[{c + 1}:], embedding[1:{c}])"
        )
        return (
            f"SELECT vec_id + {c * STRIDE} AS vec_id, {emb} AS embedding, "
            f"label FROM {src}"
        )
    if table == "events":
        return (
            f"SELECT event_id + {c * STRIDE} AS event_id, ts, "
            f"user_id + {c * STRIDE} AS user_id, event_type, value, "
            f"props FROM {src}"
        )
    if table == "customer":
        return (
            f"SELECT c_custkey + {c * STRIDE} AS c_custkey, "
            f"c_name || '-x{c}' AS c_name, c_nationkey, c_acctbal, "
            f"c_mktsegment FROM {src}"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {c * STRIDE} AS o_orderkey, "
            f"o_custkey + {c * STRIDE} AS o_custkey, o_orderstatus, "
            f"o_totalprice, o_orderdate, o_orderpriority FROM {src}"
        )
    raise ValueError(table)


def main() -> None:
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in ["documents", "embeddings", "events", "customer", "orders"]:
        union = " UNION ALL ".join(
            copy_sql(table, c) for c in range(factor)
        )
        dst = out / f"{table}.parquet"
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")
    # small dims some queries join against: symlink-equivalent copies
    for table in ["nation", "region", "supplier", "part", "lineitem"]:
        src = f"{SRC}/{table}.parquet"
        dst = out / f"{table}.parquet"
        con.execute(
            f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)"
        )
    print("done")


if __name__ == "__main__":
    main()
