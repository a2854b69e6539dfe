"""Streaming WebM cluster landing (streaming/webm_stream.py): the
block table after draining ``.webm`` cluster chunks file-by-file must
equal the batch EBML walk over the whole presentation; later cluster
drops extend it incrementally; re-drains and re-delivered chunks are
no-ops."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.media_codecs import (
    build_webm,
    webm_blocks,
    webm_split_stream,
)
from ccgp_data_wrangling_spark.operators.merge import ParquetTable
from ccgp_data_wrangling_spark.streaming.webm_stream import (
    webm_chunk_rows,
    webm_landing_stream,
)

_TRACKS = [
    {
        "number": 1, "type": "video", "codec": "V_VP9",
        "width": 320, "height": 240,
    },
    {"number": 2, "type": "audio", "codec": "A_OPUS"},
]


def _cluster(i: int) -> dict:
    blocks: list = [
        (1, 0, i % 2 == 0, bytes([65 + i]) * (10 + i)),
        {
            "track": 1, "rel_ts": 33, "keyframe": False,
            "group": True, "payload": bytes([97 + i]) * (4 + i),
        },
    ]
    if i % 2 == 1:
        blocks.append(
            {
                "track": 2, "rel_ts": 5, "keyframe": True,
                "lacing": "xiph", "payloads": [b"qq", b"r" * (3 + i)],
            }
        )
    return {"timestamp": i * 1000, "blocks": blocks}


def _presentation(n: int) -> bytes:
    return build_webm(
        tracks=_TRACKS,
        clusters=[_cluster(i) for i in range(n)],
        duration_ticks=float(n * 1000),
    )


def _rows(df):
    return sorted(
        (r.track, r.cluster_ts, r.block, r.ts_ticks, r.keyframe,
         r.lace, r.chunk_offset, r.size)
        for r in df.collect()
    )


def _drain(spark, chunk_dir, init, target, ckpt):
    q = webm_landing_stream(
        spark, chunk_dir, init, target, checkpoint_dir=ckpt
    )
    q.awaitTermination()


def test_webm_stream_equals_batch_and_incremental(spark, tmp_path):
    blob = _presentation(4)
    init, chunks = webm_split_stream(blob)
    d = tmp_path / "chunks"
    d.mkdir()
    for i, c in enumerate(chunks[:2]):  # first two clusters land
        (d / f"c{i}.webm").write_bytes(c)
    target = ParquetTable(
        spark, str(tmp_path / "blocks"), ["track", "cluster_ts", "block"]
    )
    ckpt = str(tmp_path / "ckpt")

    _drain(spark, str(d), init, target, ckpt)
    got = _rows(target.read())
    # batch expectation: the same kernel over the same two chunks
    batch = spark.createDataFrame(
        [(bytearray(c),) for c in chunks[:2]], "payload binary"
    )
    assert got == _rows(webm_chunk_rows(batch, init))
    assert len(got) == 6  # cluster 0: 2 frames, cluster 1: 2 + 2 laces

    # the remaining clusters land; drain from the same checkpoint
    for i, c in enumerate(chunks[2:], start=2):
        (d / f"c{i}.webm").write_bytes(c)
    _drain(spark, str(d), init, target, ckpt)
    got2 = _rows(target.read())
    # cross-chunk invariant vs the WHOLE-file walk: cluster timestamps
    # make keys absolute, and frame offsets relocate chunk-locally
    full = webm_blocks(blob)
    assert sorted(
        (t, cts, ts, k, lc, sz)
        for t, cts, _b, ts, k, lc, _o, sz in got2
    ) == sorted(
        (r["track"], r["cluster_ts"], r["ts_ticks"], r["keyframe"],
         r["lace"], r["size"])
        for r in full
    )
    assert len(got2) == 12

    # idempotency: an immediate re-drain is a no-op
    _drain(spark, str(d), init, target, ckpt)
    assert _rows(target.read()) == got2

    # a re-DELIVERED chunk (same bytes, new filename) inserts nothing
    (d / "c1-retry.webm").write_bytes(chunks[1])
    _drain(spark, str(d), init, target, ckpt)
    assert _rows(target.read()) == got2


def test_webm_stream_offsets_fetch_frames(spark, tmp_path):
    """chunk_offset/size are byte ranges INTO THE LANDED CHUNK FILE —
    the property a keyframe-thumbnail fetcher depends on."""
    blob = _presentation(3)
    init, chunks = webm_split_stream(blob)
    batch = spark.createDataFrame(
        [(bytearray(c),) for c in chunks], "payload binary"
    )
    rows = webm_chunk_rows(batch, init).collect()
    by_cluster = {c["timestamp"]: ch for c, ch in
                  zip([_cluster(i) for i in range(3)], chunks)}
    for r in rows:
        chunk = by_cluster[r.cluster_ts]
        frame = chunk[r.chunk_offset : r.chunk_offset + r.size]
        assert len(frame) == r.size
        # video track frames are single-letter fills by construction
        if r.track == 1 and r.lace == 0 and r.block == 0:
            assert len(set(frame)) == 1


def test_webm_split_stream_unknown_size_inputs():
    """Splitting works on files that are ALREADY streamed shapes
    (unknown-size Segment and/or Clusters)."""
    base = _presentation(3)
    want = [
        {k: v for k, v in r.items() if k != "offset"}
        for r in webm_blocks(base)
    ]
    for kw in (
        {"unknown_size_segment": True},
        {"unknown_size_segment": True, "unknown_size_clusters": True},
    ):
        blob = build_webm(
            tracks=_TRACKS,
            clusters=[_cluster(i) for i in range(3)],
            duration_ticks=3000.0,
            **kw,
        )
        init, chunks = webm_split_stream(blob)
        assert len(chunks) == 3
        got = []
        for c in chunks:
            got.extend(
                {k: v for k, v in r.items() if k != "offset"}
                for r in webm_blocks(init + c)
            )

        def key(r):
            return (r["track"], r["cluster_ts"], r["ts_ticks"],
                    r["lace"], r["size"], r["keyframe"])

        assert sorted(map(key, got)) == sorted(map(key, want)), kw
