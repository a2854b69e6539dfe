"""Streaming WARC → curation (streaming/warc_stream.py): the curated
table after draining archives file-by-file must equal the batch
pipeline over the same archives; a second drain with new archives
picks up only the new records and stays idempotent on re-run."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.merge import ParquetTable
from ccgp_data_wrangling_spark.sources.warc import build_warc
from ccgp_data_wrangling_spark.streaming.warc_stream import (
    curate_warc_records,
    warc_archive_records,
    warc_curation_stream,
)


def _record(uri: str, body: str, *, status: int = 200, wtype: str = "response"):
    return {
        "warc_type": wtype,
        "target_uri": uri,
        "warc_date": "2024-03-01T00:00:00Z",
        "http_status": status,
        "body": f"<html><body>{body}</body></html>".encode(),
    }


def _write_archives(tmp_path, name_records):
    d = tmp_path / "archives"
    d.mkdir(exist_ok=True)
    for name, records in name_records:
        (d / name).write_bytes(build_warc(records))
    return str(d)


_FIRST = [
    (
        "a.warc.gz",
        [
            _record("http://x/1", "alpha beta gamma delta"),
            _record("http://x/2", "short"),  # fails min_words
            _record("http://x/3", "err page not found here", status=404),
            _record("http://x/4", "dup text shared across archives"),
        ],
    ),
    (
        "b.warc.gz",
        [
            _record("http://y/1", "epsilon zeta eta theta iota"),
            _record("http://y/4", "dup text shared across archives"),  # dup
            _record("http://y/5", "request record", wtype="request"),
        ],
    ),
]

_LATER = [
    (
        "c.warc.gz",
        [
            _record("http://z/1", "kappa lambda mu nu xi omicron"),
            _record("http://z/4", "dup text shared across archives"),  # dup
        ],
    ),
]


def _batch_expected(spark, archive_dir):
    recs = warc_archive_records(spark, archive_dir, streaming=False)
    return {
        (r.fingerprint, r.n_words, r.text)
        for r in curate_warc_records(recs).dropDuplicates(["fingerprint"]).collect()
    }


def _drain(spark, archive_dir, target, ckpt):
    q = warc_curation_stream(
        spark, archive_dir, target, checkpoint_dir=ckpt
    )
    q.awaitTermination()


def test_stream_equals_batch_and_incremental(spark, tmp_path):
    archive_dir = _write_archives(tmp_path, _FIRST)
    target = ParquetTable(spark, str(tmp_path / "curated"), "fingerprint")
    ckpt = str(tmp_path / "ckpt")

    _drain(spark, archive_dir, target, ckpt)
    got = {
        (r.fingerprint, r.n_words, r.text) for r in target.read().collect()
    }
    assert got == _batch_expected(spark, archive_dir)
    # curation really gated: 3 unique survivors (short/404/request/dup out)
    assert len(got) == 3

    # new archive lands; drain again from the same checkpoint
    _write_archives(tmp_path, _LATER)
    _drain(spark, archive_dir, target, ckpt)
    got2 = {
        (r.fingerprint, r.n_words, r.text) for r in target.read().collect()
    }
    assert got2 == _batch_expected(spark, archive_dir)
    assert len(got2) == 4  # one new unique doc; the cross-archive dup didn't re-insert

    # idempotency: an immediate re-drain is a no-op
    _drain(spark, archive_dir, target, ckpt)
    got3 = {
        (r.fingerprint, r.n_words, r.text) for r in target.read().collect()
    }
    assert got3 == got2


def test_wds_landing_stream_incremental(spark, tmp_path):
    """Tar shards landing over time drain into the sample table once
    each; re-drains are no-ops."""
    from ccgp_data_wrangling_spark.sources.webdataset import build_wds_shard
    from ccgp_data_wrangling_spark.streaming.warc_stream import (
        wds_landing_stream,
    )

    d = tmp_path / "shards"
    d.mkdir()
    (d / "a.tar").write_bytes(
        build_wds_shard([("k0", {"txt": b"x"}), ("k1", {"txt": b"y", "cls": b"3"})])
    )
    target = ParquetTable(
        spark, str(tmp_path / "samples"), ["shard_id", "sample_key"]
    )
    ckpt = str(tmp_path / "ckpt")

    wds_landing_stream(
        spark, str(d), target, checkpoint_dir=ckpt
    ).awaitTermination(120)
    rows = {
        r.sample_key: (r.n_parts, {k: bytes(v) for k, v in r.parts.items()})
        for r in target.read().collect()
    }
    assert rows == {
        "k0": (1, {"txt": b"x"}),
        "k1": (2, {"txt": b"y", "cls": b"3"}),
    }

    (d / "b.tar").write_bytes(build_wds_shard([("k2", {"txt": b"z"})]))
    wds_landing_stream(
        spark, str(d), target, checkpoint_dir=ckpt
    ).awaitTermination(120)
    assert target.read().count() == 3
    # immediate re-drain: no change
    wds_landing_stream(
        spark, str(d), target, checkpoint_dir=ckpt
    ).awaitTermination(120)
    assert target.read().count() == 3
