"""MPEG-audio (MP3) frame-header stream walk (operators/mpeg.py)."""

from __future__ import annotations

import pytest

from national_caseload_data_ingest_spark.operators.mpeg import (
    _BITRATES,
    _SAMPLE_RATES,
    _frame_geometry,
    mp3_build,
    mp3_walk,
)
from national_caseload_data_ingest_spark.operators.multimodal import (
    classify_codec_payload,
)


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("layer", [1, 2, 3])
def test_walk_matches_geometry_tables(version, layer):
    for idx in (1, 7, 14):
        for sr_i in (0, 1, 2):
            n = 5
            padded = {1, 4}
            p = mp3_build(
                version=version, layer=layer, bitrate_idx=idx,
                sr_idx=sr_i, n_frames=n, padded=padded, channel_mode=2,
            )
            s = mp3_walk(p)
            kbps = _BITRATES[(version, layer)][idx - 1]
            sr = _SAMPLE_RATES[version][sr_i]
            base, slot, spf = _frame_geometry(version, layer, kbps, sr)
            assert s["n_frames"] == n
            assert s["version_id"] == version
            assert s["layer"] == layer
            assert s["sample_rate"] == sr
            assert s["bitrate_kbps"] == kbps
            assert s["channel_mode"] == 2
            assert s["total_samples"] == n * spf
            assert s["total_bytes"] == n * base + slot * len(padded)


def test_mpeg25_streams_walk():
    p = mp3_build(version=25, layer=3, bitrate_idx=3, sr_idx=2, n_frames=4)
    s = mp3_walk(p)
    assert s["version_id"] == 25
    assert s["sample_rate"] == 8000
    assert s["total_samples"] == 4 * 576  # MPEG2.5 layer III half-frames


def test_id3v2_skip_is_invisible_in_byte_accounting():
    bare = mp3_walk(mp3_build(n_frames=4))
    tagged = mp3_walk(mp3_build(n_frames=4, id3_size=137))
    assert bare == tagged


def test_vbr_detection():
    p = mp3_build(per_frame_bitrate_idx=[3, 5, 7, 9], n_frames=4)
    assert mp3_walk(p)["bitrate_mode"] == "vbr"
    assert mp3_walk(mp3_build(n_frames=4))["bitrate_mode"] == "cbr"


def test_free_format_sync_scan_inference():
    """Bitrate index 0: the frame size is inferred by scanning to the
    next sync word — multi-frame, padded, and single-frame (EOF) cases."""
    p = mp3_build(n_frames=3, free_frame_bytes=52, padded={1})
    s = mp3_walk(p)
    assert s["n_frames"] == 3 and s["bitrate_mode"] == "free"
    assert s["total_bytes"] == 3 * 52 + 1  # layer-3 slot = 1 byte
    # nominal kbps = floor(base * sr / 144000) for v1 layer 3
    assert s["bitrate_kbps"] == 52 * 44100 // 144_000
    # single-frame stream: the frame extends to EOF
    one = mp3_walk(mp3_build(n_frames=1, free_frame_bytes=64))
    assert one["n_frames"] == 1 and one["total_bytes"] == 64
    # layer 1: 4-byte slots and the 48000 divisor
    l1 = mp3_walk(
        mp3_build(n_frames=2, layer=1, free_frame_bytes=100, padded={0})
    )
    assert l1["total_bytes"] == 2 * 100 + 4
    assert l1["bitrate_kbps"] == 100 * 44100 // 48_000


def test_free_format_mixed_stream_is_valueerror():
    free = mp3_build(n_frames=1, free_frame_bytes=48)
    indexed = mp3_build(n_frames=1)
    with pytest.raises(ValueError, match="inconsistent"):
        mp3_walk(free + indexed)
    with pytest.raises(ValueError, match="inconsistent"):
        mp3_walk(indexed + free)


def test_id3v2_footer_flag_is_skipped():
    """ADVICE r10: the ID3v2.4 footer flag (flags bit 4) adds 10 bytes
    the syncsafe size does not count."""
    p = mp3_build(n_frames=2)
    tag = bytearray(b"ID3\x04\x00\x10\x00\x00\x00\x05")
    tag += bytes(5)  # body counted by the syncsafe size
    tag += b"3DI\x04\x00\x10\x00\x00\x00\x05"  # 10-byte footer
    assert mp3_walk(bytes(tag) + p) == mp3_walk(p)


def test_corruption_is_valueerror():
    p = mp3_build(n_frames=3)
    with pytest.raises(ValueError, match="truncated frame body"):
        mp3_walk(p[:-3])
    with pytest.raises(ValueError, match="bad frame sync"):
        mp3_walk(b"\x00" + p[1:])
    bad = bytearray(p)
    bad[2] = 0xF0 | (bad[2] & 0x0F)
    with pytest.raises(ValueError, match="reserved bitrate"):
        mp3_walk(bytes(bad))
    bad = bytearray(p)
    bad[1] = (bad[1] & 0xE7) | (1 << 3)
    with pytest.raises(ValueError, match="reserved version"):
        mp3_walk(bytes(bad))
    with pytest.raises(ValueError, match="truncated ID3"):
        mp3_walk(b"ID3\x04\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="syncsafe"):
        mp3_walk(b"ID3\x04\x00\x00\x00\x00\x00\xff")
    with pytest.raises(ValueError, match="no frames"):
        mp3_walk(b"ID3\x04\x00\x00\x00\x00\x00\x00")
    # a stream that switches sample rate mid-way is damaged
    a = mp3_build(n_frames=2, sr_idx=0)
    b = mp3_build(n_frames=1, sr_idx=1)
    with pytest.raises(ValueError, match="inconsistent"):
        mp3_walk(a + b)


def test_classifier_routes_mp3():
    assert classify_codec_payload(mp3_build(n_frames=2)) == (
        "mp3", "decoded", "",
    )
    assert classify_codec_payload(mp3_build(n_frames=2, id3_size=40)) == (
        "mp3", "decoded", "",
    )
    # free format decodes since round 11 (sync-scan inference)
    assert classify_codec_payload(
        mp3_build(n_frames=2, free_frame_bytes=48)
    ) == ("mp3", "decoded", "")
    fmt, status, _ = classify_codec_payload(mp3_build(n_frames=2)[:-1])
    assert (fmt, status) == ("mp3", "corrupt")


def test_sniff_requires_parseable_header():
    """ADVICE r10: an arbitrary FF Ex binary must file as 'unknown',
    not mp3/corrupt — the sniff needs a fully parseable first header."""
    # reserved bitrate index 15
    fmt, status, _ = classify_codec_payload(b"\xff\xe2\xf0\x00rest")
    assert (fmt, status) == ("unknown", "unrouted")
    # reserved samplerate index 3
    fmt, status, _ = classify_codec_payload(b"\xff\xfb\x5c\x00"[:2] + b"\x5f\x00")
    assert fmt == "unknown"
    # reserved layer bits (b1 & 0x06 == 0)
    fmt, status, _ = classify_codec_payload(b"\xff\xe1\x50\x00rest")
    assert fmt == "unknown"
    # a genuinely valid header still sniffs as mp3
    fmt, _s, _ = classify_codec_payload(mp3_build(n_frames=1)[:4] + b"x")
    assert fmt == "mp3"
