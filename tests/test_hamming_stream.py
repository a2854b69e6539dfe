"""Incremental Hamming near-dup (streaming/hamming_stream.py): the
pairs ledger after chunked folds must equal the batch operator over
the whole corpus; replaying a chunk is a no-op."""

from __future__ import annotations

import random

from ccgp_data_wrangling_spark.operators.dedup import hamming_neardup_pairs
from ccgp_data_wrangling_spark.streaming.hamming_stream import (
    HammingDedupState,
    hamming_neardup_stream,
)


def _corpus():
    rng = random.Random(9)
    rows = [(i, rng.getrandbits(63)) for i in range(80)]
    # planted twins of ids 0-9 flipping 1-3 bits, landing in LATER
    # chunks than their bases
    for i in range(10):
        fp = rows[i][1]
        for b in range(i % 3 + 1):
            fp ^= 1 << ((i * 11 + b * 7) % 63)
        rows.append((1000 + i, fp))
    return rows


def test_chunked_folds_match_batch_and_replay(spark, tmp_path):
    rows = _corpus()
    df_all = spark.createDataFrame(rows, "id long, fp long")
    want = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_neardup_pairs(
            df_all, "id", "fp", max_hamming=3, n_bands=8, band_width=8
        ).collect()
    )
    assert want  # twins must actually pair

    state = HammingDedupState(spark, str(tmp_path / "state"), max_hamming=3)
    chunks = [rows[:30], rows[30:60], rows[60:]]
    for chunk in chunks:
        state.fold(spark.createDataFrame(chunk, "id long, fp long"))
    got = sorted(
        (r.id_a, r.id_b, r.hamming) for r in state.pairs().collect()
    )
    assert got == want

    # replay: folding an already-seen chunk changes nothing
    state.fold(spark.createDataFrame(chunks[1], "id long, fp long"))
    got2 = sorted(
        (r.id_a, r.id_b, r.hamming) for r in state.pairs().collect()
    )
    assert got2 == want


def test_streaming_drain(spark, tmp_path):
    rows = _corpus()
    src = tmp_path / "src"
    for j in range(3):
        chunk = rows[j * 30 : (j + 1) * 30]
        if chunk:
            spark.createDataFrame(chunk, "id long, fp long").coalesce(
                1
            ).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("id long, fp long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = HammingDedupState(spark, str(tmp_path / "state"), max_hamming=3)
    q = hamming_neardup_stream(
        stream, state, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    df_all = spark.createDataFrame(rows, "id long, fp long")
    want = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_neardup_pairs(
            df_all, "id", "fp", max_hamming=3, n_bands=8, band_width=8
        ).collect()
    )
    got = sorted(
        (r.id_a, r.id_b, r.hamming) for r in state.pairs().collect()
    )
    assert got == want
