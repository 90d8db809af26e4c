"""MJPEG-in-AVI container path: RIFF walk, frame extraction, sampled
decode through the native JPEG decoder, interleaved 'rec ' groups,
multi-stream selection, honest gates, and the oracle-checked query."""

import struct

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    JPEG_H,
    JPEG_W,
    jpeg_encode,
)
from national_caseload_data_ingest_spark.operators.video import (
    MJPEG_SAMPLE_EVERY,
    avi_encode_mjpeg,
    avi_extract_frames,
    sample_mjpeg_frames,
)


def _frames(n, seed=0):
    out = []
    for f in range(n):
        vals = 128 + 2 * ((seed + f + np.arange(6)) % 64 - 32)
        px = np.repeat(
            np.repeat(vals.reshape(2, 3), 8, 0), 8, 1
        ).astype(np.uint8)
        out.append(jpeg_encode(px))
    return out


def test_roundtrip_frames_bit_exact():
    frames = _frames(8)
    got = avi_extract_frames(avi_encode_mjpeg(frames, width=JPEG_W, height=JPEG_H))
    assert got == frames


def test_odd_length_frame_padding():
    """RIFF chunks pad odd bodies with one byte; extraction must strip it."""
    frames = [b"\xff\xd8odd", b"\xff\xd8even!"]  # lengths 5 and 7... both odd
    assert any(len(f) & 1 for f in frames)
    got = avi_extract_frames(avi_encode_mjpeg(frames))
    assert got == frames


def test_sampled_decode_every_second_frame():
    frames = _frames(8, seed=3)
    avi = avi_encode_mjpeg(frames)
    sampled = sample_mjpeg_frames(avi, every=MJPEG_SAMPLE_EVERY)
    assert [i for i, _ in sampled] == [0, 2, 4, 6]
    for i, px in sampled:
        assert px.shape == (16, 24)
        vals = 128 + 2 * ((3 + i + np.arange(6)) % 64 - 32)
        assert px.sum() == int(vals.sum()) * 64


def test_rec_groups_and_other_streams_skipped():
    """Interleaved AVIs wrap frames in LIST 'rec ' groups and carry audio
    chunks ('01wb') the video walk must skip."""
    frames = [b"\xff\xd8AA", b"\xff\xd8BB"]

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    rec = chunk(
        b"LIST",
        b"rec "
        + chunk(b"00dc", frames[0])
        + chunk(b"01wb", b"AUDIO")
        + chunk(b"00dc", frames[1]),
    )
    movi = chunk(b"LIST", b"movi" + rec)
    payload = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    assert avi_extract_frames(payload) == frames
    # default kinds are video-only: stream 1 carries no dc/db chunks
    assert avi_extract_frames(payload, stream=1) == []
    assert avi_extract_frames(payload, stream=1, kinds=("wb",)) == [b"AUDIO"]
    # an audio chunk mislabeled into stream 0 must NOT reach the video list
    rec_bad = chunk(
        b"LIST",
        b"rec " + chunk(b"00dc", frames[0]) + chunk(b"00wb", b"AUDIO"),
    )
    movi_bad = chunk(b"LIST", b"movi" + rec_bad)
    payload_bad = (
        b"RIFF" + struct.pack("<I", 4 + len(movi_bad)) + b"AVI " + movi_bad
    )
    assert avi_extract_frames(payload_bad) == [frames[0]]


def test_gates():
    with pytest.raises(ValueError, match="RIFF"):
        avi_extract_frames(b"NOTRIFF!")
    with pytest.raises(NotImplementedError, match="not AVI"):
        avi_extract_frames(b"RIFF\x04\x00\x00\x00WAVE")
    truncated = avi_encode_mjpeg([b"\xff\xd8XX"])[:-3]
    with pytest.raises(ValueError, match="overruns"):
        avi_extract_frames(truncated)


def test_mjpeg_frame_features_query(spark):
    from national_caseload_data_ingest_spark.operators.video import (
        mjpeg_frame_features,
    )

    rows = mjpeg_frame_features(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_index"])
        assert (r["width"], r["height"]) == (JPEG_W, JPEG_H)
    assert all(sorted(v) == [0, 2, 4, 6] for v in by_doc.values())


def test_classifier_avi_codec_routing():
    """Round-10: the classifier is codec-AWARE for AVI — an MJPG stream
    decodes (first frame through the real JPEG decoder), an inter-coded
    handler gates with the SCALING.md policy reason, and a corrupt
    MJPG frame reports corrupt rather than decoded."""
    import numpy as np

    from national_caseload_data_ingest_spark.operators.multimodal import (
        classify_codec_payload,
        jpeg_encode,
    )
    from national_caseload_data_ingest_spark.operators.video import (
        avi_encode_mjpeg,
        avi_video_fourcc,
    )

    frame = jpeg_encode(np.full((8, 8), 77, np.uint8))
    good = avi_encode_mjpeg([frame], width=8, height=8)
    assert avi_video_fourcc(good) == b"MJPG"
    assert classify_codec_payload(good) == ("avi", "decoded", "")
    inter = good.replace(b"MJPG", b"VP90")
    fmt, status, reason = classify_codec_payload(inter)
    assert (fmt, status) == ("avi", "gated")
    assert "VP90" in reason and "route to decoder host" in reason
    bad = avi_encode_mjpeg([b"\xff\xd8junk"], width=8, height=8)
    fmt, status, _ = classify_codec_payload(bad)
    assert (fmt, status) == ("avi", "corrupt")
