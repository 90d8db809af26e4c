"""WARC reader (operators/warc.py): gzip member framing, record
grammar, HTTP payload extraction."""

from __future__ import annotations

import zlib

import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    classify_codec_payload,
)
from national_caseload_data_ingest_spark.operators.warc import (
    _synth_records,
    gzip_members,
    http_payload,
    warc_build,
    warc_walk,
)


@pytest.mark.parametrize("gz", [True, False])
def test_walk_three_record_capture(gz):
    recs = warc_walk(warc_build(_synth_records(7), gzip_framing=gz))
    assert [r["type"] for r in recs] == ["warcinfo", "request", "response"]
    status, headers, body = http_payload(recs[2]["body"])
    assert status == 301  # 7 % 3 == 1
    assert headers["content-type"] == "text/html"
    assert body.startswith(b"<html>") and body.endswith(b"</html>")
    assert recs[2]["target_uri"] == "https://w0.example7.org/page7"


def test_gzip_members_split_and_rejoin():
    blobs = [b"alpha", b"beta" * 100, b""]
    stream = b""
    for b in blobs:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        stream += c.compress(b) + c.flush()
    assert gzip_members(stream) == blobs


def test_body_is_exactly_content_length():
    """A body containing CRLF CRLF must NOT terminate the record early
    — only Content-Length counts."""
    tricky = b"first\r\n\r\nsecond"
    recs = warc_walk(
        warc_build([("resource", "", tricky)], gzip_framing=False)
    )
    assert recs[0]["body"] == tricky


def test_corruption_is_valueerror():
    p = warc_build(_synth_records(3))
    with pytest.raises(ValueError, match="gzip"):
        warc_walk(p[:-4])
    with pytest.raises(ValueError, match="neither gzip"):
        warc_walk(b"\x00\x01" + p[2:])
    plain = warc_build(_synth_records(3), gzip_framing=False)
    with pytest.raises(ValueError, match="record separator"):
        warc_walk(plain[:-2])
    with pytest.raises(ValueError, match="Content-Length"):
        warc_walk(plain.replace(b"Content-Length", b"X-Length", 1))
    with pytest.raises(ValueError, match="neither gzip"):
        warc_walk(plain.replace(b"WARC/1.0", b"WARC/9.9", 1))
    # version damage INSIDE a gzip member hits the record-level check
    with pytest.raises(ValueError, match="bad version line"):
        warc_walk(_gz(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated record body"):
        warc_walk(_gz(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"))


def _gz(b: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(b) + c.flush()


def test_chunked_transfer_encoding_gates():
    body = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n3\r\nabc"
    with pytest.raises(NotImplementedError, match="chunked"):
        http_payload(body)


def test_classifier_routes_warc_and_gzip():
    p = warc_build(_synth_records(4))
    assert classify_codec_payload(p) == ("warc", "decoded", "")
    plain = warc_build(_synth_records(4), gzip_framing=False)
    assert classify_codec_payload(plain) == ("warc", "decoded", "")
    assert classify_codec_payload(_gz(b"just some text")) == (
        "gzip", "decoded", "",
    )
    # a truncated gzip member can't be identified as WARC — it files
    # under the container format it structurally is
    fmt, status, _ = classify_codec_payload(p[:-3])
    assert (fmt, status) == ("gzip", "corrupt")
    fmt, status, _ = classify_codec_payload(plain[:-2])
    assert (fmt, status) == ("warc", "corrupt")
