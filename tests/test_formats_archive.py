"""Stream-compression codecs (operators/formats.py round-11 addition):
sniff-and-decompress for zlib/gzip/bz2/xz, gates, and the oracle query."""

from __future__ import annotations

import bz2
import lzma
import zlib

import pytest

from national_caseload_data_ingest_spark.operators.formats import (
    _synth_archive,
    archive_codec_features,
    archive_decompress,
)


def test_sniff_and_roundtrip_all_four():
    raw = b"the quick brown fox " * 40
    cases = [
        ("zlib", zlib.compress(raw)),
        ("gzip", (lambda c: c.compress(raw) + c.flush())(
            zlib.compressobj(6, zlib.DEFLATED, 31))),
        ("bz2", bz2.compress(raw)),
        ("xz", lzma.compress(raw)),
    ]
    for want_fmt, payload in cases:
        fmt, back = archive_decompress(payload)
        assert (fmt, back) == (want_fmt, raw)


def test_zstd_lz4_decode_and_unknown_rejects():
    import pyarrow as pa

    raw = b"payload bytes " * 40
    assert archive_decompress(
        pa.compress(raw, codec="zstd", asbytes=True)) == ("zstd", raw)
    assert archive_decompress(
        pa.compress(raw, codec="lz4", asbytes=True)) == ("lz4", raw)
    # junk after the zstd magic is CORRUPT (the codec decodes now);
    # the gate remains for frames with no declared content size
    with pytest.raises(ValueError, match="corrupt"):
        archive_decompress(b"\x28\xb5\x2f\xfd....")
    with pytest.raises(ValueError, match="unrecognized"):
        archive_decompress(b"\x00\x01\x02\x03")
    # a truncated member is corruption, not a gate
    p = _synth_archive(2)
    with pytest.raises(Exception):
        archive_decompress(p[: len(p) // 2])


def test_archive_query(spark):
    rows = {r["doc_id"]: r for r in archive_codec_features(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert len(rows) == 500
    for did, r in rows.items():
        assert r["fmt"] == ("zlib", "gzip", "bz2", "xz", "zstd",
                            "lz4")[did % 6]
        assert r["raw_bytes"] == 256 + did % 256


def test_classifier_routes_archives():
    import bz2
    import lzma

    from national_caseload_data_ingest_spark.operators.multimodal import (
        classify_codec_payload,
    )

    assert classify_codec_payload(bz2.compress(b"data")) == (
        "bz2", "decoded", "",
    )
    assert classify_codec_payload(lzma.compress(b"data")) == (
        "xz", "decoded", "",
    )
    import pyarrow as pa

    fmt, status, reason = classify_codec_payload(
        pa.compress(b"data", codec="zstd", asbytes=True))
    assert (fmt, status, reason) == ("zstd", "decoded", "")
    fmt, status, _ = classify_codec_payload(b"\x28\xb5\x2f\xfd....")
    assert (fmt, status) == ("zstd", "corrupt")
    fmt, status, _ = classify_codec_payload(bz2.compress(b"data")[:-3])
    assert (fmt, status) == ("bz2", "corrupt")
