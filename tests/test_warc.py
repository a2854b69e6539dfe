"""WARC ingest (sources/warc.py): record walk, multi-member gunzip,
HTTP split, tag-strip, and the Spark mapInPandas explode."""

from __future__ import annotations

import gzip

import pytest

from ccgp_data_wrangling_spark.sources.warc import (
    build_warc,
    html_to_text,
    parse_warc,
    warc_records,
)


def _blob(gz=True):
    return build_warc(
        [
            {
                "warc_type": "request",
                "target_uri": "http://x.test/a",
                "payload": b"GET /a HTTP/1.1\r\n\r\n",
            },
            {
                "warc_type": "response",
                "target_uri": "http://x.test/a",
                "http_status": 200,
                "body": b"<html><body><h1>Title</h1><p>hello   world</p></body></html>",
            },
            {
                "warc_type": "response",
                "target_uri": "http://x.test/b",
                "http_status": 404,
                "body": b"<html>not found</html>",
            },
        ],
        gzip_members=gz,
    )


@pytest.mark.parametrize("gz", [True, False])
def test_parse_roundtrip(gz):
    recs = parse_warc(_blob(gz))
    assert [r["warc_type"] for r in recs] == ["request", "response", "response"]
    assert recs[1]["http_status"] == 200
    assert recs[1]["content_type"] == "text/html"
    assert html_to_text(recs[1]["body"]) == "Title hello world"
    assert recs[2]["http_status"] == 404
    # request payload kept raw, no HTTP-response split
    assert recs[0]["http_status"] is None
    assert recs[0]["body"].startswith(b"GET ")


def test_gzip_members_are_independent():
    """Each record is its own gzip member (the splittable Common Crawl
    layout): decompressing ONLY the first member yields record 1."""
    blob = _blob(True)
    # find the second member boundary by the gzip magic
    second = blob.index(b"\x1f\x8b", 2)
    first_member = gzip.decompress(blob[:second])
    recs = parse_warc(first_member)
    assert len(recs) == 1 and recs[0]["warc_type"] == "request"


def test_truncated_and_garbage_raise():
    blob = _blob(False)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(blob[:-30])
    with pytest.raises(ValueError, match="expected WARC"):
        parse_warc(b"NOT A WARC\r\n\r\n")


def test_warc_records_spark_explode(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_blob(True))), (2, bytearray(_blob(True)))],
        "archive_id long, payload binary",
    )
    rows = warc_records(df).collect()
    # response_only: 2 responses per archive
    assert len(rows) == 4
    by_key = {(r.archive_id, r.target_uri): r for r in rows}
    r = by_key[(1, "http://x.test/a")]
    assert r.http_status == 200 and r.text == "Title hello world"
    assert by_key[(2, "http://x.test/b")].http_status == 404
    # all=both types
    assert len(warc_records(df, response_only=False).collect()) == 6
