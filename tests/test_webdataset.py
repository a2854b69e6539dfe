"""WebDataset tar-shard ingest (sources/webdataset.py): grouping by
first-dot key, multi-extension parts, directory prefixes, Spark
explode with map<string, binary> parts."""

from __future__ import annotations

import io
import tarfile

from ccgp_data_wrangling_spark.sources.webdataset import (
    build_wds_shard,
    iter_wds_samples,
    wds_samples,
)


def test_wds_grouping_first_dot_and_multi_ext():
    shard = build_wds_shard(
        [
            ("0001", {"jpg": b"IMG1", "cls": b"7", "seg.png": b"SEG"}),
            ("0002", {"jpg": b"IMG2", "json": b"{}"}),
        ]
    )
    got = list(iter_wds_samples(shard))
    assert [k for k, _ in got] == ["0001", "0002"]
    assert got[0][1] == {"jpg": b"IMG1", "cls": b"7", "seg.png": b"SEG"}
    assert got[1][1] == {"jpg": b"IMG2", "json": b"{}"}


def test_wds_directory_prefixes_and_nonfile_members():
    """Keys come from the basename; directory entries are skipped —
    real shards nest samples under directories."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("data/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, data in [
            ("data/a.txt", b"A"),
            ("data/a.cls", b"1"),
            ("data/b.txt", b"B"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = dict(iter_wds_samples(buf.getvalue()))
    assert got == {"a": {"txt": b"A", "cls": b"1"}, "b": {"txt": b"B"}}


def test_wds_samples_spark_explode(spark):
    shard1 = build_wds_shard([("k0", {"txt": b"x"}), ("k1", {"txt": b"yy", "cls": b"3"})])
    shard2 = build_wds_shard([("k2", {"txt": b"zzz"})])
    df = spark.createDataFrame(
        [(1, bytearray(shard1)), (2, bytearray(shard2))],
        "shard_id long, payload binary",
    )
    rows = {
        (r.shard_id, r.sample_key): (r.n_parts, {k: bytes(v) for k, v in r.parts.items()})
        for r in wds_samples(df).collect()
    }
    assert rows == {
        (1, "k0"): (1, {"txt": b"x"}),
        (1, "k1"): (2, {"txt": b"yy", "cls": b"3"}),
        (2, "k2"): (1, {"txt": b"zzz"}),
    }
