"""ICO (favicon) container: DIB + embedded-PNG entries, AND-mask alpha.

Pure-kernel tests (no Spark): the decoder/encoder pair lives in
``operators/multimodal.py`` and the E2E query ``ico_decode_features``
is oracle-checked by the driver."""

import struct

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    CUR_SIGNATURE,
    ICO_SIGNATURE,
    _ico_dib_encode,
    classify_codec_payload,
    ico_decode,
    ico_decode_entries,
    ico_encode,
    png_encode,
)


def _pal(m):
    j = np.arange(m, dtype=np.int64)
    return np.stack(
        [(j * 7) % 256, (j * 11) % 256, (j * 13) % 256], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("bpp", [1, 2, 4, 8])
def test_ico_paletted_roundtrip_with_mask(bpp):
    rng = np.random.default_rng(bpp)
    m = 1 << bpp
    idx = rng.integers(0, m, (9, 13)).astype(np.uint8)
    transparent = rng.integers(0, 2, (9, 13)).astype(bool)
    blob = _ico_dib_encode(
        idx=idx, palette=_pal(m), bpp=bpp, transparent=transparent
    )
    (w, h, ch, px), = ico_decode_entries(ico_encode([blob]))
    assert (w, h, ch) == (13, 9, 4)
    assert np.array_equal(px[:, :, :3], _pal(m)[idx])
    assert np.array_equal(px[:, :, 3], np.where(transparent, 0, 255))


def test_ico_24bpp_roundtrip_with_mask():
    rng = np.random.default_rng(24)
    rgb = rng.integers(0, 256, (7, 11, 3)).astype(np.uint8)
    transparent = rng.integers(0, 2, (7, 11)).astype(bool)
    blob = _ico_dib_encode(rgb=rgb, transparent=transparent)
    (w, h, ch, px), = ico_decode_entries(ico_encode([blob]))
    assert (w, h, ch) == (11, 7, 4)
    assert np.array_equal(px[:, :, :3], rgb)
    assert np.array_equal(px[:, :, 3], np.where(transparent, 0, 255))


def test_ico_32bpp_alpha_plane_ignores_mask():
    rng = np.random.default_rng(32)
    rgba = rng.integers(0, 256, (5, 6, 4)).astype(np.uint8)
    blob = _ico_dib_encode(rgba=rgba)
    (w, h, ch, px), = ico_decode_entries(ico_encode([blob]))
    assert (w, h, ch) == (6, 5, 4)
    assert np.array_equal(px, rgba)


def test_ico_embedded_png_entry_keeps_native_channels():
    gray = (np.arange(48, dtype=np.int64) % 256).astype(
        np.uint8).reshape(6, 8)
    png = png_encode(gray)
    entries = ico_decode_entries(ico_encode([(png, 8, 6)]))
    (w, h, ch, px), = entries
    assert (w, h, ch) == (8, 6, 1)
    assert np.array_equal(px[:, :, 0], gray)


def test_ico_best_entry_is_largest_then_first():
    small = _ico_dib_encode(rgba=np.zeros((4, 4, 4), np.uint8))
    big_a = _ico_dib_encode(rgba=np.full((8, 8, 4), 1, np.uint8))
    big_b = _ico_dib_encode(rgba=np.full((8, 8, 4), 2, np.uint8))
    w, h, ch, px = ico_decode(ico_encode([small, big_a, big_b]))
    assert (w, h) == (8, 8)
    assert px[0, 0, 0] == 1  # tie on area -> earliest directory entry


def test_ico_gates():
    blob = _ico_dib_encode(rgba=np.zeros((2, 2, 4), np.uint8))
    payload = ico_encode([blob])

    with pytest.raises(NotImplementedError, match="cursor"):
        ico_decode_entries(CUR_SIGNATURE + payload[4:])

    # compressed DIB entry
    data, w, h = blob
    bad = bytearray(data)
    struct.pack_into("<I", bad, 16, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compressed"):
        ico_decode_entries(ico_encode([(bytes(bad), w, h)]))

    # 16-bpp entry
    bad = bytearray(data)
    struct.pack_into("<H", bad, 14, 16)
    with pytest.raises(NotImplementedError, match="bpp 16"):
        ico_decode_entries(ico_encode([(bytes(bad), w, h)]))


def test_ico_corruption_is_valueerror():
    blob = _ico_dib_encode(rgba=np.zeros((2, 2, 4), np.uint8))
    payload = ico_encode([blob])

    with pytest.raises(ValueError, match="not an ICO"):
        ico_decode_entries(b"\x00\x00\x03\x00" + payload[4:])
    with pytest.raises(ValueError, match="empty"):
        ico_decode_entries(ICO_SIGNATURE + struct.pack("<H", 0))
    with pytest.raises(ValueError, match="truncated image directory"):
        ico_decode_entries(payload[:10])
    with pytest.raises(ValueError, match="out of bounds"):
        ico_decode_entries(payload[:-4])

    # non-doubled height inside the DIB entry
    data, w, h = blob
    bad = bytearray(data)
    struct.pack_into("<i", bad, 8, 3)
    with pytest.raises(ValueError, match="doubled height"):
        ico_decode_entries(ico_encode([(bytes(bad), w, h)]))

    # palette index past the declared color count
    idx = np.array([[3]], np.uint8)
    pblob, pw, ph = _ico_dib_encode(idx=idx, palette=_pal(4), bpp=2)
    short = bytearray(pblob)
    struct.pack_into("<I", short, 32, 2)  # biClrUsed = 2 < index 3
    trimmed = bytes(short[:40]) + bytes(short[40:48]) + bytes(short[56:])
    with pytest.raises(ValueError, match="index out of range"):
        ico_decode_entries(ico_encode([(trimmed, pw, ph)]))


def test_classify_routes_ico():
    blob = _ico_dib_encode(rgba=np.zeros((2, 2, 4), np.uint8))
    payload = ico_encode([blob])
    assert classify_codec_payload(payload) == ("ico", "decoded", "")
    fmt, status, reason = classify_codec_payload(CUR_SIGNATURE + payload[4:])
    assert (fmt, status) == ("ico", "gated")
    assert "cursor" in reason
    fmt, status, _ = classify_codec_payload(payload[:12])
    assert (fmt, status) == ("ico", "corrupt")


def test_decode_image_dispatches_ico():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        decode_image,
        png_decode,
        resize_image,
    )
    import numpy as np

    blob = _ico_dib_encode(rgba=np.full((8, 8, 4), 7, np.uint8))
    payload = ico_encode([blob])
    w, h, ch, px = decode_image(payload)
    assert (w, h, ch) == (8, 8, 4)
    assert px[0, 0, 0] == 7
    out = resize_image(payload, 4, 4)  # PNG by contract
    w2, h2, _ch2, _small = png_decode(out)
    assert (w2, h2) == (4, 4)
