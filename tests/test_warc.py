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


def test_chunked_transfer_encoding_decodes():
    wire = b"4;ext=x\r\nwiki\r\n5\r\npedia\r\n0\r\nX-Trailer: 1\r\n\r\n"
    body = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + wire
    status, _h, payload = http_payload(body)
    assert (status, payload) == (200, b"wikipedia")


def test_chunked_corruption_is_valueerror():
    head = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    with pytest.raises(ValueError, match="truncated chunk"):
        http_payload(head + b"5\r\nabc")
    with pytest.raises(ValueError, match="bad chunk size"):
        http_payload(head + b"zz\r\nabc\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="chunk terminator"):
        http_payload(head + b"3\r\nabcXX0\r\n\r\n")
    with pytest.raises(ValueError, match="unterminated chunk-size"):
        http_payload(head + b"3")


def test_gzip_content_encoding_decodes():
    raw = b"<html>hello crawl</html>"
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + _gz(raw)
    )
    assert http_payload(body)[2] == raw
    # chunked applied OVER the gzip bytes (wire order) round-trips too
    from national_caseload_data_ingest_spark.operators.warc import (
        _chunk_encode,
    )

    body = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + _chunk_encode(_gz(raw), 5)
    )
    assert http_payload(body)[2] == raw


def test_exotic_encodings_gate():
    with pytest.raises(NotImplementedError, match="content-encoding"):
        http_payload(b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nx")
    with pytest.raises(NotImplementedError, match="transfer-encoding"):
        http_payload(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\nx"
        )


def test_bad_content_length_is_warc_valueerror():
    for bad in (b"-5", b"12x", b""):
        rec = b"WARC/1.0\r\nContent-Length: " + bad + b"\r\n\r\n"
        with pytest.raises(ValueError, match="warc: bad Content-Length"):
            warc_walk(_gz(rec))


def test_all_four_wire_modes_roundtrip():
    """did mod 4 rotates identity/chunked/gzip/chunked+gzip — all four
    must decode to the same closed-form html payload."""
    for did in (8, 9, 10, 11):
        recs = warc_walk(warc_build(_synth_records(did)))
        _s, _h, payload = http_payload(recs[2]["body"])
        n = 64 + did % 128
        want = (
            b"<html>"
            + bytes((did + k) % 64 + 32 for k in range(n))
            + b"</html>"
        )
        assert payload == want, did


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
