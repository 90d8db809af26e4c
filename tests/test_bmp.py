"""BMP codec tests (`operators/multimodal.py`): round-trips across both
bit depths, row padding, top-down order, palette expansion, dispatch,
and honest gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from national_caseload_data_ingest_spark.operators.multimodal import (
    bmp_decode,
    bmp_encode,
    decode_image,
    png_decode,
    resize_image,
)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    rgb=st.booleans(),
)
def test_bmp_roundtrip_property(w, h, seed, rgb):
    """encode→decode is the identity for every size (incl. widths whose
    rows need 4-byte padding) and both bit depths."""
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ww, hh, ch, back = bmp_decode(bmp_encode(px))
    assert (ww, hh, ch) == (w, h, 3 if rgb else 1)
    assert (back.reshape(shape) == px).all()


def test_bmp_topdown_rows_decode_equal_bottomup():
    px = np.arange(48, dtype=np.uint8).reshape(4, 12)
    payload = bytearray(bmp_encode(px))
    # flip height sign → top-down; re-order the pixel rows to match
    offset = struct.unpack_from("<I", payload, 10)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    stride = 12  # w=12 is already 4-aligned
    body = payload[offset:]
    rows = [bytes(body[i * stride:(i + 1) * stride]) for i in range(4)]
    payload[offset:] = b"".join(reversed(rows))
    w2, h2, ch, back = bmp_decode(bytes(payload))
    assert (h2, w2, ch) == (4, 12, 1)
    assert (back.reshape(4, 12) == px).all()


def test_bmp_nongray_palette_expands_to_rgb():
    px = np.zeros((2, 4), dtype=np.uint8)
    payload = bytearray(bmp_encode(px))
    # palette entry 0 → pure red (stored BGR0)
    struct.pack_into("<BBBB", payload, 14 + 40, 0, 0, 255, 0)
    w, h, ch, back = bmp_decode(bytes(payload))
    assert ch == 3
    assert (back[0, 0] == [255, 0, 0]).all()


def test_bmp_dispatch_and_resize():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = bmp_encode(px)
    w, h, ch, arr = decode_image(payload)
    assert (w, h, ch) == (8, 8, 1)
    out = resize_image(payload, 4, 4)  # returns PNG by contract
    w2, h2, _ch2, small = png_decode(out)
    assert (w2, h2) == (4, 4)
    assert small[0, 0, 0] == px[0, 0]


def test_bmp_honest_gates():
    px = np.zeros((2, 2), dtype=np.uint8)
    payload = bytearray(bmp_encode(px))
    struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        bmp_decode(bytes(payload))
    with pytest.raises(ValueError):
        bmp_decode(b"XX" + bytes(payload[2:]))
