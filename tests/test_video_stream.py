"""Streaming DASH segment landing (streaming/video_stream.py): the
sample table after draining ``.m4s`` segments file-by-file must equal
the batch fragment walk over the whole presentation; later segment
drops extend it incrementally; re-drains and re-delivered segments
are no-ops."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.media_codecs import (
    build_fragmented_mp4,
    mp4_sample_table,
    mp4_split_segments,
)
from ccgp_data_wrangling_spark.operators.merge import ParquetTable
from ccgp_data_wrangling_spark.streaming.video_stream import (
    dash_landing_stream,
    dash_segment_rows,
)

_TRACKS = [
    {
        "track_ID": 1, "width": 320, "height": 240,
        "codec": "avc1", "media_timescale": 1000,
    }
]


def _fragment(i: int) -> dict:
    return {
        "track_ID": 1,
        "tfdt": i * 66,
        "samples": [
            {"size": 10 + i, "duration": 33, "sync": True},
            {"size": 7 + i, "duration": 33, "sync": False},
        ],
    }


def _presentation(n: int) -> bytes:
    return build_fragmented_mp4(
        tracks=_TRACKS, fragments=[_fragment(i) for i in range(n)]
    )


def _rows(df):
    return sorted(
        (r.track, r.chunk, r.sample, r.dts, r.size, r.mdat_offset,
         r.keyframe)
        for r in df.collect()
    )


def _drain(spark, seg_dir, init, target, ckpt):
    q = dash_landing_stream(
        spark, seg_dir, init, target, checkpoint_dir=ckpt
    )
    q.awaitTermination()


def test_dash_stream_equals_batch_and_incremental(spark, tmp_path):
    blob = _presentation(4)
    init, segs = mp4_split_segments(blob)
    d = tmp_path / "segments"
    d.mkdir()
    for i, s in enumerate(segs[:2]):  # first two segments land
        (d / f"seg{i}.m4s").write_bytes(s)
    target = ParquetTable(
        spark, str(tmp_path / "samples"), ["track", "chunk", "sample"]
    )
    ckpt = str(tmp_path / "ckpt")

    _drain(spark, str(d), init, target, ckpt)
    got = _rows(target.read())
    # batch expectation: the same kernel over the same two segments
    batch = spark.createDataFrame(
        [(bytearray(s),) for s in segs[:2]], "payload binary"
    )
    assert got == _rows(dash_segment_rows(batch, init))
    assert len(got) == 4  # 2 segments × 2 samples

    # the remaining segments land; drain from the same checkpoint
    for i, s in enumerate(segs[2:], start=2):
        (d / f"seg{i}.m4s").write_bytes(s)
    _drain(spark, str(d), init, target, ckpt)
    got2 = _rows(target.read())
    full = mp4_sample_table(blob)
    # cross-segment invariant vs the WHOLE-file walk: everything but
    # the per-walk sample counter matches exactly (tfdt makes dts
    # absolute; default-base-is-moof makes offsets relocatable)
    assert sorted(
        (t, c, d_, sz, o, k) for t, c, _s, d_, sz, o, k in got2
    ) == sorted(
        (r["track"], r["chunk"], r["dts"], r["size"],
         r["mdat_offset"], r["keyframe"])
        for r in full
    )
    assert len(got2) == 8

    # idempotency: an immediate re-drain is a no-op
    _drain(spark, str(d), init, target, ckpt)
    assert _rows(target.read()) == got2

    # a re-DELIVERED segment (same bytes, new filename — the dup a
    # flaky encoder upload produces) inserts nothing: its keys exist
    (d / "seg1-retry.m4s").write_bytes(segs[1])
    _drain(spark, str(d), init, target, ckpt)
    assert _rows(target.read()) == got2
