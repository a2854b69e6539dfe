"""Two-point scaling curve: time data-heavy queries at sf0.01 and
sf0.1 (median of 3, cache-scoped like bench.py) and print the ratio.

10× more data should cost ≤ ~10× for linear operators — on this box
fixed overheads keep healthy ratios well under that. A ratio ABOVE
the data ratio is a superlinear red flag; this tool is how round 6
caught tfidf_cosine_neardup at 28× (inverted-index self-join
degenerating on a dense corpus) before any user would.

Usage: python tools/scaling_curve.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ccgp_data_wrangling_spark.caching import CacheScope, use_scope
from ccgp_data_wrangling_spark.queries import all_queries
from ccgp_data_wrangling_spark.session import get_spark

DEFAULT = [
    "q1_pricing_summary", "q3_top_orders", "r1_adjacent_pairs",
    "t_hourly_rollup", "minhash_neardup_planted", "ngram_jaccard_neardup",
    "tfidf_cosine_neardup", "containment_join_retrieval",
    "knn_top10_cosine", "interval_coverage_users", "span_dedup_crossdoc",
    "dedup_exact_canonical", "token_counts", "kmv_distinct_users",
    "bm25_topk_retrieval", "rag_retrieve_chunks", "cdc_chunk_dedup_shifted",
    "entity_resolution_golden", "bigram_lm_score", "repetition_filter_gopher",
    "market_basket_pairs", "url_normalize_dedup", "event_path_trigrams",
    "simhash_dup_planted", "embedding_cosine_neardup", "curation_pipeline_e2e",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scaling-curve")
    qs = all_queries()
    out: dict[str, dict[str, float]] = {}
    for tag, d in [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]:
        qs["q1_pricing_summary"](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in names:
            samples = []
            with CacheScope() as sc, use_scope(sc):
                for _ in range(3):
                    df = qs[name](spark, d)
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
            out.setdefault(name, {})[tag] = round(sorted(samples)[1], 3)
    print(f"{'ratio':>7}  {'sf0.01':>8}  {'sf0.1':>8}  query")
    flagged = 0
    for n, v in sorted(
        out.items(), key=lambda kv: -(kv[1]["sf0.1"] / max(kv[1]["sf0.01"], 1e-9))
    ):
        r = v["sf0.1"] / max(v["sf0.01"], 1e-9)
        flag = "  <-- SUPERLINEAR" if r > 10 else ""
        flagged += r > 10
        print(f"{r:6.1f}x  {v['sf0.01']:8.3f}  {v['sf0.1']:8.3f}  {n}{flag}")
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
