"""Ogg container page walk (operators/ogg.py)."""

from __future__ import annotations

import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    classify_codec_payload,
)
from national_caseload_data_ingest_spark.operators.ogg import (
    _ogg_crc,
    ogg_build,
    ogg_build_page,
    ogg_walk,
)


def test_walk_vorbis_summary():
    p = ogg_build(codec="vorbis", channels=2, sample_rate=44100,
                  n_audio_pages=4, final_granule=88200)
    s = ogg_walk(p)
    assert s["codec"] == "vorbis"
    assert s["channels"] == 2
    assert s["sample_rate"] == 44100
    assert s["n_pages"] == 5
    assert s["n_streams"] == 1
    assert s["last_granule"] == 88200
    assert s["total_bytes"] == len(p)


def test_walk_opus_summary():
    s = ogg_walk(ogg_build(codec="opus", channels=1, sample_rate=48000))
    assert (s["codec"], s["channels"], s["sample_rate"]) == (
        "opus", 1, 48000,
    )


def test_long_bodies_exercise_255_lacing():
    # 700-byte body -> lacing 255,255,190: three runs in one page
    p = ogg_build(body_len=700, n_audio_pages=2)
    s = ogg_walk(p)
    assert s["n_pages"] == 3
    assert s["total_bytes"] == len(p)


def test_crc_is_rfc3533_not_zlib():
    import zlib

    data = b"OggS test vector"
    assert _ogg_crc(data) != zlib.crc32(data)
    assert _ogg_crc(b"") == 0


def test_corruption_is_valueerror():
    p = bytearray(ogg_build())
    p[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_walk(bytes(p))
    with pytest.raises(ValueError, match="truncated page body"):
        ogg_walk(ogg_build()[:-3])
    with pytest.raises(ValueError, match="capture pattern"):
        ogg_walk(b"NotOggData" + ogg_build()[10:])
    with pytest.raises(ValueError, match="no pages"):
        ogg_walk(b"")
    # version byte must be 0 (checked before the CRC)
    p = bytearray(ogg_build())
    p[4] = 1
    with pytest.raises(ValueError, match="page version"):
        ogg_walk(bytes(p))


def test_unknown_codec_gates():
    page = ogg_build_page(9, 0, 0, b"XXXXWEIRDCODEC", 0x02)
    with pytest.raises(NotImplementedError, match="route to decoder host"):
        ogg_walk(page)


def test_classifier_routes_ogg():
    assert classify_codec_payload(ogg_build()) == ("ogg", "decoded", "")
    fmt, status, _ = classify_codec_payload(ogg_build()[:-2])
    assert (fmt, status) == ("ogg", "corrupt")
    page = ogg_build_page(9, 0, 0, b"XXXXWEIRDCODEC", 0x02)
    fmt, status, reason = classify_codec_payload(page)
    assert (fmt, status) == ("ogg", "gated")
    assert "route" in reason


def _page_raw(serial, seq, granule, lacing, body, flags):
    """Page with an EXPLICIT lacing table (so a trailing 255 can leave
    the packet unterminated — ogg_build_page always terminates)."""
    import struct

    from national_caseload_data_ingest_spark.operators.ogg import _ogg_crc

    hdr = b"OggS" + struct.pack(
        "<BBqIIIB", 0, flags, granule, serial, seq, 0, len(lacing)
    )
    page = bytearray(hdr + bytes(lacing) + body)
    page[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
    return bytes(page)


def test_bos_packet_spanning_pages_reassembles():
    """ADVICE r10: a BOS id packet whose last lacing value is 255
    continues on the next page — the walker must reassemble it."""
    import struct

    ident = (
        b"OpusHead\x01" + bytes([2]) + b"\x00\x00"
        + struct.pack("<I", 48000) + bytes(3)
    )
    ident = ident + bytes(300 - len(ident))  # pad past one lace run
    p1 = _page_raw(9, 0, 0, [255], ident[:255], 0x02)
    p2 = _page_raw(9, 1, 0, [len(ident) - 255], ident[255:], 0x01)
    p3 = ogg_build_page(9, 2, 960, b"\x0bdata", 0x04)
    s = ogg_walk(p1 + p2 + p3)
    assert (s["codec"], s["channels"], s["sample_rate"]) == (
        "opus", 2, 48000,
    )
    assert s["n_pages"] == 3


def test_bos_unterminated_without_continuation_is_valueerror():
    import struct

    ident = (
        b"OpusHead\x01" + bytes([2]) + b"\x00\x00"
        + struct.pack("<I", 48000) + bytes(3)
    )
    ident = ident + bytes(300 - len(ident))
    p1 = _page_raw(9, 0, 0, [255], ident[:255], 0x02)
    p2 = _page_raw(9, 1, 0, [len(ident) - 255], ident[255:], 0x00)
    with pytest.raises(ValueError, match="without continuation"):
        ogg_walk(p1 + p2)
