"""Pure-stdlib GIF codec: LZW round-trips (including variable code-width
growth and the 4096-entry dictionary reset), decoder robustness against
spec features our encoder doesn't emit (extensions, local palettes,
deferred clears), dispatch, and the synthesize→decode E2E query — all with
NO codec library (same contract as the PNG codec)."""

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    _lzw_compress,
    _lzw_decompress,
    decode_image,
    gif_decode,
    gif_encode,
)


@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (12, 16), (64, 64), (1, 300), (300, 1)]
)
def test_gif_roundtrip_shapes(shape):
    rng = np.random.default_rng(shape[0] * 1000 + shape[1])
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    w, h, ch, px = gif_decode(gif_encode(arr))
    assert (w, h, ch) == (shape[1], shape[0], 3)
    # grayscale palette: every channel equals the index
    for c in range(3):
        assert np.array_equal(px[:, :, c], arr)


def test_gif_roundtrip_forces_dictionary_reset():
    """200×200 random pixels assign far more than 4096 LZW codes, so the
    encoder must emit a mid-stream clear and both sides must resync."""
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, (200, 200), dtype=np.uint8)
    compressed = _lzw_compress(arr.tobytes(), 8)
    assert _lzw_decompress(compressed, 8) == arr.tobytes()
    _, _, _, px = gif_decode(gif_encode(arr))
    assert np.array_equal(px[:, :, 0], arr)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"\x00" * 50_000,  # one long run: KwKwK case on every step
        bytes([i % 2 for i in range(30_000)]),
        bytes(range(256)) * 300,
    ],
    ids=["empty", "constant-run", "alternating", "cycling"],
)
def test_lzw_roundtrip_patterns(data):
    assert _lzw_decompress(_lzw_compress(data, 8), 8) == data


def test_gif_decode_skips_extension_blocks():
    """Graphic-control/comment extensions (which real encoders emit and
    ours doesn't) must be skipped, not choked on."""
    payload = gif_encode(np.arange(12, dtype=np.uint8).reshape(3, 4))
    head_len = 6 + 7 + 256 * 3  # signature + LSD + global palette
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    comment = b"\x21\xfe\x05hello\x00"
    patched = payload[:head_len] + gce + comment + payload[head_len:]
    w, h, ch, px = gif_decode(patched)
    assert (w, h, ch) == (4, 3, 3)
    assert np.array_equal(px[:, :, 0], np.arange(12).reshape(3, 4))


def test_gif_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"\x89PNG\r\n\x1a\n rest")
    # interlace flag on sequentially-stored rows applies the spec's
    # 4-pass deinterlace permutation (the flag is honored, not gated:
    # round-trip coverage lives in test_round9_ops / the animated path)
    arr = np.tile(np.arange(8, dtype=np.uint8)[:, None], (1, 2))
    payload = bytearray(gif_encode(arr))
    desc = 6 + 7 + 256 * 3  # image descriptor offset
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40  # interlace bit in the image packed field
    from national_caseload_data_ingest_spark.operators.multimodal import (
        _gif_interlace_order,
    )

    _, _, _, px = gif_decode(bytes(payload))
    expect = np.empty_like(arr)
    expect[_gif_interlace_order(8)] = arr
    assert np.array_equal(px[..., 0], expect)
    # End-of-data without an explicit EOI code is an IMPLICIT EOI (the
    # classic 1x1 spacer GIF relies on it — see
    # test_thirdparty_vectors.py); corruption is still caught one level
    # up by gif_decode's pixel-count check.
    assert _lzw_decompress(b"", 8) == b""
    short = bytearray(gif_encode(np.arange(16, dtype=np.uint8).reshape(4, 4)))
    # gather the LZW bytes (after descriptor + min code size), halve
    # them, re-block: the decoded index count no longer matches w*h
    desc = 6 + 7 + 256 * 3
    data_at = desc + 10 + 1
    p, lzw = data_at, bytearray()
    while short[p]:
        n = short[p]
        lzw += short[p + 1 : p + 1 + n]
        p += 1 + n
    half = lzw[: len(lzw) // 2]
    truncated = (
        bytes(short[:data_at]) + bytes([len(half)]) + bytes(half)
        + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="wrong length|corrupt"):
        gif_decode(truncated)


def test_decode_image_dispatches_gif_without_pil():
    arr = np.full((3, 3), 17, dtype=np.uint8)
    w, h, ch, px = decode_image(gif_encode(arr))
    assert (w, h, ch) == (3, 3, 3)
    assert np.array_equal(px[:, :, 1], arr)


def test_resize_gif_to_png_nearest_neighbor():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        png_decode,
        resize_image,
    )

    arr = np.zeros((2, 2), dtype=np.uint8)
    arr[0, 1] = arr[1, 0] = 255
    up = resize_image(gif_encode(arr), 4, 4)
    w, h, ch, px = png_decode(up)
    assert (w, h, ch) == (4, 4, 3)
    want = np.repeat(np.repeat(arr, 2, 0), 2, 1)
    assert np.array_equal(px[:, :, 0], want)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_gif_roundtrip_property(h, w, seed):
        """Any 8-bit grayscale image round-trips bit-exactly."""
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        gw, gh, ch, px = gif_decode(gif_encode(arr))
        assert (gw, gh, ch) == (w, h, 3)
        assert np.array_equal(px[:, :, 0], arr)

    @given(data=st.binary(max_size=2000))
    @settings(max_examples=60, deadline=None)
    def test_lzw_roundtrip_property(data):
        assert _lzw_decompress(_lzw_compress(data, 8), 8) == data


def test_gif_decode_features_query(spark):
    """The synthesize→decode pipeline matches the closed form on real doc
    ids (the driver also hash-checks this against the DuckDB oracle)."""
    import __spark_entry__ as ent

    rows = {
        r["doc_id"]: r
        for r in ent.queries()["gif_decode_features"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) > 0
    n = IMG_W * IMG_H
    for doc_id, r in list(rows.items())[:20]:
        want = sum((doc_id * 3 + k) % 256 for k in range(n)) / n
        assert (r["width"], r["height"], r["channels"]) == (IMG_W, IMG_H, 3)
        assert r["mean_pixel"] == pytest.approx(want, abs=0)
