"""Fit scaling exponents for the flagship operator families over a
REAL decade of data: sf0.1 vs the 10× id-shifted/content-perturbed
scale-up from tools/make_scaled_sf.py (run that first).

For each query: median-of-3 noop-sink timings at both scales (the
bench protocol), exponent = log(t_big/t_small) / log(factor).
Healthy linear families fit well under 1.0 on this box because fixed
per-query overhead (plan, JIT, task launch) doesn't grow with data;
an exponent approaching 2 means the candidate space is quadratic —
exactly what this harness exists to catch.  Writes
SCALING_CURVE_r07.json next to SCALING.md's shuffle-budget table.

Usage: python tools/scaling_fit.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ccgp_data_wrangling_spark.caching import CacheScope, use_scope
from ccgp_data_wrangling_spark.queries import all_queries
from ccgp_data_wrangling_spark.session import get_spark

SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_SCALED_DIR", "/tmp/sf_scaled")
FACTOR = float(os.environ.get("SPARK_GRAFT_SCALED_FACTOR", "10"))

# SCALING.md flagship families (round-6 verdict task 3)
DEFAULT = [
    "j1_linkage_fileset",          # linkage span join
    "minhash_neardup_planted",     # MinHash LSH
    "fingerprint_hamming_neardup", # Hamming banding
    "tfidf_cosine_neardup",        # sparse-cosine / dense-BLAS split
    "span_dedup_crossdoc",         # substring span dedup
    "ann_ivf_multiquery_planted",  # multi-query IVF
]


def time_query(qs, spark, name: str, d: str) -> float:
    samples = []
    with CacheScope() as sc, use_scope(sc):
        for _ in range(3):
            df = qs[name](spark, d)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    if not Path(BIG, "documents.parquet").exists():
        sys.exit(f"{BIG} missing — run tools/make_scaled_sf.py first")
    spark = get_spark(app_name="scaling-fit")
    qs = all_queries()
    # warm-up both directories (JVM, parquet footers, codegen)
    qs["q1_pricing_summary"](spark, SMALL).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        t_small = time_query(qs, spark, name, SMALL)
        t_big = time_query(qs, spark, name, BIG)
        exp = round(
            math.log(max(t_big, 1e-3) / max(t_small, 1e-3))
            / math.log(FACTOR),
            3,
        )
        out[name] = {
            "t_sf0.1_sec": t_small,
            f"t_{FACTOR:g}x_sec": t_big,
            "exponent": exp,
        }
        print(f"{name}: {t_small}s -> {t_big}s  exponent {exp}")
    artifact = {
        "factor": FACTOR,
        "small_dir": SMALL,
        "big_dir": BIG,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "families": out,
    }
    out_file = os.environ.get(
        "SPARK_GRAFT_SCALING_OUT", "SCALING_CURVE_r07.json"
    )
    with open(out_file, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
