"""tfidf_cosine_pairs: the dense blocked-BLAS path and the sparse
prefix-filter path are both COMPLETE candidate restrictions, so they
must produce identical pairs — and match a pure-Python brute force."""

from __future__ import annotations

import math
from collections import Counter

from ccgp_data_wrangling_spark.operators.dedup import tfidf_cosine_pairs


def _corpus():
    rows = []
    vocab = [f"w{i}" for i in range(40)]
    for d in range(60):
        words = [vocab[(d * 7 + j * 3) % 40] for j in range(30)]
        rows.append((d, " ".join(words)))
    # planted near-identical family
    for d in range(5):
        words = [vocab[(d * 7 + j * 3) % 40] for j in range(30)]
        words[0] = "rareterm"
        rows.append((100 + d, " ".join(words)))
    return rows


def _brute(rows, threshold):
    n = len(rows)
    tf = {i: Counter(t.split()) for i, t in rows}
    df = Counter()
    for c in tf.values():
        for t in c:
            df[t] += 1
    idf_s = {
        t: round((math.log((n + 1) / (d + 1)) + 1) * 1000) for t, d in df.items()
    }
    w = {
        i: {t: c * idf_s[t] for t, c in cnt.items()} for i, cnt in tf.items()
    }
    norm = {i: math.sqrt(sum(v * v for v in ws.values())) for i, ws in w.items()}
    ids = [i for i, _ in rows]
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            dot = sum(w[a][t] * w[b].get(t, 0) for t in w[a])
            cos = round(dot / (norm[a] * norm[b]), 4)
            if cos >= threshold:
                out.add((min(a, b), max(a, b), cos))
    return out


def test_dense_and_sparse_paths_match_brute_force(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _brute(rows, 0.9)
    assert want  # the planted family must actually pair

    dense = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=0.9
        ).collect()
    }  # 41 terms <= dense_vocab default -> blocked-BLAS path
    sparse = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=0.9, dense_vocab=0
        ).collect()
    }  # forced prefix-filter path
    assert dense == want
    assert sparse == want
