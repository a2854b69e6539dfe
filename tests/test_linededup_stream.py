"""Incremental line dedup: chunked folds ≡ the batch operator,
cross-batch ownership, replay idempotency."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.linededup import (
    dedup_lines_first_wins,
)
from ccgp_data_wrangling_spark.streaming.linededup_stream import (
    LineDedupState,
)

DOCS = [
    (1, "a b c d e f g h i j k l m n o p"),          # lines L1 L2
    (2, "a b c d e f g h x x x x x x x x"),          # L1 (dup) + L3
    (3, "q q q q q q q q a b c d e f g h"),          # L4 + L1 (dup)
    (4, "x x x x x x x x q q q q q q q q"),          # L3 + L4 (dups)
    (5, "fresh words only here eight of them yes"),  # L5
]


def _by_id(rows):
    return {r.id: (r.text_clean, r.n_lines, r.n_kept) for r in rows}


def test_chunked_folds_match_batch_operator(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    want = _by_id(
        dedup_lines_first_wins(df, "doc_id", "text", line_tokens=8)
        .collect()
    )
    state = LineDedupState(spark, str(tmp_path / "st"), line_tokens=8)
    got = {}
    for lo, hi in [(1, 2), (3, 3), (4, 5)]:
        chunk = spark.createDataFrame(
            [d for d in DOCS if lo <= d[0] <= hi],
            "doc_id long, text string",
        )
        got.update(_by_id(state.fold(chunk).collect()))
    assert got == want
    # cross-batch: doc 4's lines were both owned by earlier batches
    assert got[4] == ("", 2, 0)
    assert got[1][2] == 2 and got[5][2] == 1


def test_replay_is_idempotent(spark, tmp_path):
    state = LineDedupState(spark, str(tmp_path / "st2"), line_tokens=8)
    b1 = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    first = _by_id(state.fold(b1).collect())
    owners_after = state.owners().count()
    replay = _by_id(state.fold(b1).collect())
    assert replay == first
    assert state.owners().count() == owners_after  # state unchanged


def test_state_is_one_row_per_distinct_line(spark, tmp_path):
    state = LineDedupState(spark, str(tmp_path / "st3"), line_tokens=8)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    state.fold(df)
    # distinct lines: L1..L5 = 5
    assert state.owners().count() == 5


def test_batch_hash_keys_matches_string_keys_and_stream(spark, tmp_path):
    """hash_keys=True keys the ownership window by xxhash64(line) —
    the keying LineDedupState always uses — and must produce the same
    rewrite as full-string keying (collision-free corpus) AND stay
    byte-identical to the chunked stream."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plain = _by_id(
        dedup_lines_first_wins(df, "doc_id", "text", line_tokens=8)
        .collect()
    )
    hashed = _by_id(
        dedup_lines_first_wins(
            df, "doc_id", "text", line_tokens=8, hash_keys=True
        ).collect()
    )
    assert hashed == plain
    state = LineDedupState(spark, str(tmp_path / "st4"), line_tokens=8)
    got = {}
    for lo, hi in [(1, 3), (4, 5)]:
        chunk = spark.createDataFrame(
            [d for d in DOCS if lo <= d[0] <= hi],
            "doc_id long, text string",
        )
        got.update(_by_id(state.fold(chunk).collect()))
    assert got == hashed
