"""QOI codec (operators/qoi.py): op coverage, state-machine rules,
corruption triage."""

from __future__ import annotations

import pytest

from national_caseload_data_ingest_spark.operators.qoi import (
    _synth_pixels,
    qoi_decode,
    qoi_encode,
)


def test_roundtrip_exercises_every_op():
    """The synthetic stream must round-trip AND hit all five op
    classes (RUN, INDEX, DIFF, LUMA, RGB) in the encoded bytes."""
    w, h = 15, 11
    px = _synth_pixels(123, w * h)
    payload = qoi_encode(w, h, px)
    got = qoi_decode(payload)
    assert got[:3] == (w, h, 3)
    assert [(r, g, b) for r, g, b, a in got[3]] == px
    assert all(a == 255 for *_rgb, a in got[3])
    body = payload[14:-8]
    ops = set()
    i = 0
    while i < len(body):
        b0 = body[i]
        if b0 == 0xFE:
            ops.add("rgb"); i += 4
        elif b0 == 0xFF:
            ops.add("rgba"); i += 5
        else:
            tag = b0 >> 6
            if tag == 0: ops.add("index"); i += 1
            elif tag == 1: ops.add("diff"); i += 1
            elif tag == 2: ops.add("luma"); i += 2
            else: ops.add("run"); i += 1
    assert {"rgb", "index", "diff", "luma", "run"} <= ops


def test_rgba_alpha_transitions():
    px = [(1, 2, 3, 255), (1, 2, 3, 128), (4, 5, 6, 128), (4, 5, 6, 128)]
    payload = qoi_encode(2, 2, px, channels=4)
    w, h, ch, back = qoi_decode(payload)
    assert (w, h, ch) == (2, 2, 4)
    assert back == px


def test_wraparound_diffs_mod256():
    """DIFF and LUMA deltas are mod-256 per spec: 255 -> 0 is dr=+1."""
    px = [(255, 255, 255), (0, 0, 0), (0, 224, 0)]  # +1 wrap, dg=-32 luma
    payload = qoi_encode(3, 1, px)
    _w, _h, _c, back = qoi_decode(payload)
    assert [(r, g, b) for r, g, b, _ in back] == px


def test_long_runs_split_at_62():
    px = [(7, 7, 7)] * 200
    payload = qoi_encode(200, 1, px)
    _w, _h, _c, back = qoi_decode(payload)
    assert len(back) == 200 and set(back) == {(7, 7, 7, 255)}


def test_index_table_is_stateful():
    """A color seen once must be emitted as a 1-byte INDEX op on its
    second occurrence (with different colors in between)."""
    px = [(10, 20, 30), (100, 110, 120), (10, 20, 30)]
    payload = qoi_encode(3, 1, px)
    _w, _h, _c, back = qoi_decode(payload)
    assert [(r, g, b) for r, g, b, _ in back] == px


def test_corruption_is_valueerror():
    payload = qoi_encode(4, 2, _synth_pixels(5, 8))
    with pytest.raises(ValueError, match="magic"):
        qoi_decode(b"QOIF" + payload[4:])
    with pytest.raises(ValueError, match="end marker"):
        qoi_decode(payload[:-1])
    with pytest.raises(ValueError, match="truncated chunk|run past|trailing"):
        bad = bytearray(payload)
        # inflate the claimed height so the stream runs dry
        bad[8:12] = (99).to_bytes(4, "big")
        qoi_decode(bytes(bad))
    with pytest.raises(NotImplementedError, match="channels"):
        qoi_decode(payload[:12] + b"\x05" + payload[13:])
    with pytest.raises(ValueError, match="colorspace"):
        qoi_decode(payload[:13] + b"\x07" + payload[14:])


def test_run_past_pixel_count_rejected():
    px = [(7, 7, 7)] * 5
    payload = bytearray(qoi_encode(5, 1, px))
    # shrink the claimed width so the run overruns
    payload[4:8] = (3).to_bytes(4, "big")
    with pytest.raises(ValueError, match="run past"):
        qoi_decode(bytes(payload))
