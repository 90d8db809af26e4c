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
    struct.pack_into("<I", payload, 30, 11)  # BI_CMYK still gates
    with pytest.raises(NotImplementedError):
        bmp_decode(bytes(payload))
    # BI_ALPHABITFIELDS is SUPPORTED since round 10, but only at 16/32
    # bpp — an 8-bpp header claiming it is structural nonsense
    struct.pack_into("<I", payload, 30, 6)
    with pytest.raises(ValueError, match="16 or 32"):
        bmp_decode(bytes(payload))
    # BI_JPEG is SUPPORTED since round 10: raw sample bytes under that
    # tag are corruption (no SOI), not a gate
    struct.pack_into("<I", payload, 30, 4)
    with pytest.raises(ValueError):
        bmp_decode(bytes(payload))


# ---------------------------------------------------------------------------
# round-10 extensions: 1/4-bpp packed palettes, BI_RLE8/BI_RLE4, 32-bpp
# ---------------------------------------------------------------------------


def _pal(m):
    j = np.arange(m, dtype=np.int64)
    return np.stack(
        [(j * 7) % 256, (j * 11) % 256, (j * 13) % 256], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_bmp_packed_palette_roundtrip(bpp):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_paletted,
    )

    rng = np.random.default_rng(bpp)
    m = 1 << bpp
    idx = rng.integers(0, m, (9, 13)).astype(np.uint8)
    w, h, ch, px = bmp_decode(bmp_encode_paletted(idx, _pal(m), bpp=bpp))
    assert (w, h, ch) == (13, 9, 3)
    assert np.array_equal(px, _pal(m)[idx])


@pytest.mark.parametrize("bpp", [4, 8])
def test_bmp_rle_roundtrip(bpp):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_paletted,
    )

    rng = np.random.default_rng(bpp + 50)
    m = 1 << bpp
    idx = np.repeat(rng.integers(0, m, (6, 5)), 3, axis=1).astype(np.uint8)
    w, h, ch, px = bmp_decode(
        bmp_encode_paletted(idx, _pal(m), bpp=bpp, rle=True)
    )
    assert (w, h, ch) == (15, 6, 3)
    assert np.array_equal(px, _pal(m)[idx])


def test_bmp_32bpp_ignores_pad_byte():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_32,
    )

    rng = np.random.default_rng(32)
    rgb = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    payload = bytearray(bmp_encode_32(rgb))
    # scribble over the X bytes: decode must not change
    body_off = struct.unpack_from("<I", payload, 10)[0]
    for i in range(body_off + 3, len(payload), 4):
        payload[i] = 0xAB
    w, h, ch, px = bmp_decode(bytes(payload))
    assert (w, h, ch) == (7, 5, 3)
    assert np.array_equal(px, rgb)


def _rle_wrap(body, w, h, bpp):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        _bmp_wrap,
    )

    quads = np.zeros((1 << bpp, 4), np.uint8)
    quads[:, :3] = _pal(1 << bpp)[:, ::-1]
    return _bmp_wrap(bpp, w, h, 1 if bpp == 8 else 2, quads.tobytes(), body)


def test_bmp_rle8_absolute_delta_and_skip():
    """Hand-built stream: absolute mode, a delta jump, and an early EOB
    leave skipped pixels at index 0 (background)."""
    # 4x2 image, file order bottom-up: row0(file) = image row 1
    body = bytes(
        [
            0x00, 0x03, 5, 6, 7, 0x00,  # absolute run of 3 (padded to word)
            0x00, 0x02, 0, 1,           # delta: same x, next file row
            0x01, 9,                    # encoded run: 1 px of 9 at (1, 3)
            0x00, 0x01,                 # EOB — rest stays background 0
        ]
    )
    w, h, ch, px = bmp_decode(_rle_wrap(body, 4, 2, 8))
    pal = _pal(256)
    # file rows are bottom-up: file row 0 = image row 1
    exp_idx = np.array([[0, 0, 0, 9], [5, 6, 7, 0]], np.uint8)
    assert np.array_equal(px, pal[exp_idx])


def test_bmp_rle4_alternating_run():
    """An encoded RLE4 run alternates the byte's two nibbles."""
    body = bytes([0x05, 0x2A, 0x00, 0x01])  # 5 px of pattern 2,10,2,10,2
    w, h, ch, px = bmp_decode(_rle_wrap(body, 5, 1, 4))
    exp_idx = np.array([[2, 10, 2, 10, 2]], np.uint8)
    assert np.array_equal(px, _pal(16)[exp_idx])


def test_bmp_rle_corruption_is_valueerror():
    with pytest.raises(ValueError, match="truncated stream"):
        bmp_decode(_rle_wrap(bytes([0x05]), 5, 1, 8))
    with pytest.raises(ValueError, match="overflows row"):
        bmp_decode(_rle_wrap(bytes([0x09, 0x01, 0x00, 0x01]), 5, 1, 8))
    with pytest.raises(ValueError, match="delta out of bounds"):
        bmp_decode(_rle_wrap(bytes([0x00, 0x02, 9, 9, 0x00, 0x01]), 5, 1, 8))
    with pytest.raises(ValueError, match="truncated absolute"):
        bmp_decode(_rle_wrap(bytes([0x00, 0x04, 1, 1]), 5, 1, 8))
    # RLE flag on a top-down or wrong-bpp header is structural nonsense
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_paletted,
    )

    good = bytearray(
        bmp_encode_paletted(
            np.zeros((2, 2), np.uint8), _pal(256), bpp=8, rle=True
        )
    )
    struct.pack_into("<H", good, 28, 4)  # claim bpp 4 under BI_RLE8
    with pytest.raises(ValueError, match="matching bpp"):
        bmp_decode(bytes(good))


@pytest.mark.parametrize(
    "masks,bpp",
    [
        ((0xF800, 0x07E0, 0x001F), 16),  # 565
        ((0x7C00, 0x03E0, 0x001F), 16),  # 555
        ((0x00FF0000, 0x0000FF00, 0x000000FF), 32),  # 8888
        ((0x3FF00000, 0x000FFC00, 0x000003FF), 32),  # 2-10-10-10
    ],
)
def test_bmp_bitfields_roundtrip(masks, bpp):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_bitfields,
    )

    rng = np.random.default_rng(bpp)
    peaks = [m >> ((m & -m).bit_length() - 1) for m in masks]
    q = np.stack([rng.integers(0, p + 1, (9, 13)) for p in peaks], -1)
    w, h, ch, px = bmp_decode(bmp_encode_bitfields(q, masks, bpp=bpp))
    assert (w, h, ch) == (13, 9, 3)
    exp = np.stack(
        [(q[:, :, c] * 255 // peaks[c]) for c in range(3)], -1
    ).astype(np.uint8)
    assert np.array_equal(px, exp)


def test_bmp_bitfields_bad_masks_are_valueerror():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_bitfields,
    )

    p = bytearray(
        bmp_encode_bitfields(
            np.zeros((2, 2, 3), np.int64), (0xF800, 0x07E0, 0x001F)
        )
    )
    struct.pack_into("<I", p, 54, 0)
    with pytest.raises(ValueError, match="zero channel mask"):
        bmp_decode(bytes(p))
    struct.pack_into("<I", p, 54, 0b101000)
    with pytest.raises(ValueError, match="non-contiguous"):
        bmp_decode(bytes(p))


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_bmp_core_header_paletted_roundtrip(bpp):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_core,
    )

    rng = np.random.default_rng(bpp + 90)
    m = 1 << bpp
    idx = rng.integers(0, m, (9, 13)).astype(np.uint8)
    w, h, ch, px = bmp_decode(bmp_encode_core(idx, _pal(m), bpp=bpp))
    assert (w, h, ch) == (13, 9, 3)
    assert np.array_equal(px, _pal(m)[idx])


def test_bmp_core_header_rgb_and_gray_ramp():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_core,
    )

    rng = np.random.default_rng(91)
    rgb = rng.integers(0, 256, (7, 11, 3)).astype(np.uint8)
    w, h, ch, px = bmp_decode(bmp_encode_core(rgb))
    assert (w, h, ch) == (11, 7, 3)
    assert np.array_equal(px, rgb)
    # identity gray ramp (RGB triples) still collapses to one channel
    g = rng.integers(0, 256, (5, 6)).astype(np.uint8)
    ramp = np.stack([np.arange(256)] * 3, -1).astype(np.uint8)
    _w, _h, ch, px = bmp_decode(bmp_encode_core(g, ramp, bpp=8))
    assert ch == 1
    assert np.array_equal(px[:, :, 0], g)


def test_bmp_core_header_bad_bpp_and_unknown_header_size():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_core,
    )

    p = bytearray(bmp_encode_core(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", p, 24, 32)  # 32 bpp is not a core depth
    with pytest.raises(ValueError, match="core header"):
        bmp_decode(bytes(p))
    struct.pack_into("<I", p, 14, 20)  # header size between 12 and 40
    with pytest.raises(ValueError, match="unknown DIB header"):
        bmp_decode(bytes(p))


def test_bmp_embedded_png_and_jpeg_streams():
    """BI_PNG/BI_JPEG (compression 5/4): the pixel area is a complete
    embedded stream routed to the native codec."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_embedded,
        jpeg_encode,
        png_encode,
    )

    rng = np.random.default_rng(45)
    rgb = rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
    w, h, ch, px = bmp_decode(
        bmp_encode_embedded(png_encode(rgb), 13, 9, "png")
    )
    assert (w, h, ch) == (13, 9, 3)
    assert np.array_equal(px, rgb)

    m = np.arange(6, dtype=np.int64).reshape(2, 3)
    g = np.repeat(np.repeat(128 + 2 * (m % 64 - 32), 8, 0), 8, 1).astype(
        np.uint8
    )
    w, h, ch, px = bmp_decode(
        bmp_encode_embedded(jpeg_encode(g), 24, 16, "jpeg")
    )
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(px[:, :, 0], g)

    with pytest.raises(ValueError, match="geometry disagrees"):
        bmp_decode(bmp_encode_embedded(png_encode(rgb), 12, 9, "png"))


def test_bmp_alpha_bitfields_four_channels():
    """BI_ALPHABITFIELDS (compression 6) adds an alpha mask — decodes
    to RGBA with the same exact rescale."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        bmp_encode_bitfields,
    )

    rng = np.random.default_rng(6)
    masks = (0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    q = rng.integers(0, 256, (9, 13, 4)).astype(np.int64)
    w, h, ch, px = bmp_decode(bmp_encode_bitfields(q, masks, bpp=32))
    assert (w, h, ch) == (13, 9, 4)
    assert np.array_equal(px, q.astype(np.uint8))

    masks4444 = (0x0F00, 0x00F0, 0x000F, 0xF000)
    q = rng.integers(0, 16, (5, 7, 4)).astype(np.int64)
    w, h, ch, px = bmp_decode(bmp_encode_bitfields(q, masks4444, bpp=16))
    assert (w, h, ch) == (7, 5, 4)
    assert np.array_equal(px, (q * 255 // 15).astype(np.uint8))
