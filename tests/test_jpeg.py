"""Pure-numpy baseline JPEG codec (grayscale, ITU-T T.81, standard Annex K
tables): exactness on quantization-safe inputs, bounded loss on general
inputs, marker/bit-level edge cases, and the synthesize→decode E2E query —
all with NO codec library (the last PIL-gated image format with a native
path; color/progressive remain honestly gated)."""

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    JPEG_H,
    JPEG_W,
    _JPEG_BLOCKS,
    decode_image,
    jpeg_decode,
    jpeg_encode,
    resize_image,
)


def _block_constant(doc_id: int) -> np.ndarray:
    b = np.arange(_JPEG_BLOCKS, dtype=np.int64)
    vals = 128 + 2 * ((doc_id + b) % 64 - 32)
    return (
        vals.reshape(JPEG_H // 8, JPEG_W // 8)[:, None, :, None]
        * np.ones((1, 8, 1, 8), dtype=np.int64)
    ).reshape(JPEG_H, JPEG_W).astype(np.uint8)


@pytest.mark.parametrize("doc_id", [0, 7, 63, 64, 1000])
def test_jpeg_exact_on_even_offset_block_constants(doc_id):
    """Block-constant images with EVEN offsets from 128 survive quality-50
    quantization exactly (DC = 8*offset, Q00 = 16 | 16m) — the property
    the SQL oracle's closed-form mean depends on."""
    px = _block_constant(doc_id)
    assert np.array_equal(jpeg_decode(jpeg_encode(px)), px)


def test_jpeg_lossy_bounded_on_gradient_and_noise():
    g = (np.add.outer(np.arange(32), np.arange(40)) * 3).astype(np.uint8)
    dg = jpeg_decode(jpeg_encode(g))
    assert dg.shape == g.shape
    assert np.max(np.abs(dg.astype(int) - g.astype(int))) <= 8
    rng = np.random.default_rng(7)
    n = rng.integers(0, 256, (24, 24), dtype=np.uint8).astype(np.uint8)
    dn = jpeg_decode(jpeg_encode(n))
    # random noise is the worst case for DCT quantization; the bound is
    # loose but the decode must be deterministic and dimension-exact
    assert dn.shape == n.shape
    assert np.array_equal(dn, jpeg_decode(jpeg_encode(n)))
    assert np.mean(np.abs(dn.astype(int) - n.astype(int))) < 40


@pytest.mark.parametrize("shape", [(8, 8), (13, 9), (1, 1), (16, 7), (9, 32)])
def test_jpeg_odd_dimensions_crop(shape):
    """Non-multiple-of-8 dims: encoder pads by edge replication, SOF keeps
    the true size, decoder crops back."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    px = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(px))
    assert dec.shape == shape


def test_jpeg_bitstuffing_survives_ff_heavy_streams():
    """Find an image whose entropy stream contains a stuffed 0xFF00 and
    prove the decoder un-stuffs it (same decode as every other image)."""
    stuffed = None
    for seed in range(200):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (16, 16), dtype=np.uint8).astype(np.uint8)
        payload = jpeg_encode(px)
        scan = payload[payload.find(b"\xff\xda") + 10 : -2]
        if b"\xff\x00" in scan:
            stuffed = (px, payload)
            break
    assert stuffed is not None, "no stuffed byte in 200 random images"
    px, payload = stuffed
    dec = jpeg_decode(payload)
    assert dec.shape == px.shape
    assert np.array_equal(dec, jpeg_decode(jpeg_encode(px)))


def test_jpeg_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="missing SOI"):
        jpeg_decode(b"\x00\x01rubbish")
    good = bytearray(jpeg_encode(np.zeros((8, 8), np.uint8)))
    # flip SOF0 (0xFFC0) into SOF2 (progressive) — must raise, not garble
    i = bytes(good).find(b"\xff\xc0")
    good[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bytes(good))


def test_jpeg_decode_handles_restart_markers():
    """DRI/RSTn support: splice a restart interval of 1 MCU into a stream
    the encoder wrote without one, re-encoding the entropy data per block.
    Build it by encoding each 8x8 block as its own one-block image and
    stitching scans with RSTn between them."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 16), dtype=np.uint8).astype(np.uint8)
    whole = jpeg_decode(jpeg_encode(px))
    # hand-build a DRI version: header from the full encode, scan data as
    # block-0 scan + RST0 + block-1 scan (DC predictors reset per spec)
    left = jpeg_encode(px[:, :8])
    right = jpeg_encode(px[:, 8:])

    def scan_bytes(buf: bytes) -> bytes:
        s = buf.find(b"\xff\xda")
        return buf[s + 2 + 8 : buf.rfind(b"\xff\xd9")]

    full = jpeg_encode(px)
    s = full.find(b"\xff\xda")
    import struct

    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    stitched = (
        full[:s]
        + dri
        + full[s : s + 2 + 8]
        + scan_bytes(left)
        + b"\xff\xd0"
        + scan_bytes(right)
        + b"\xff\xd9"
    )
    dec = jpeg_decode(stitched)
    assert np.array_equal(dec, whole)


def test_decode_image_dispatches_jpeg_without_pil():
    px = _block_constant(5)
    w, h, ch, arr = decode_image(jpeg_encode(px))
    assert (w, h, ch) == (JPEG_W, JPEG_H, 1)
    assert np.array_equal(arr[:, :, 0], px)


def test_resize_jpeg_to_png_nearest_neighbor():
    px = _block_constant(1)
    out = resize_image(jpeg_encode(px), 12, 8)
    from national_caseload_data_ingest_spark.operators.multimodal import (
        png_decode,
    )

    w, h, ch, arr = png_decode(out)
    assert (w, h) == (12, 8)
    ys = np.minimum((np.arange(8) * JPEG_H) // 8, JPEG_H - 1)
    xs = np.minimum((np.arange(12) * JPEG_W) // 12, JPEG_W - 1)
    assert np.array_equal(arr[:, :, 0], px[ys][:, xs])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        seed=st.integers(0, 2**31),
    )
    def test_jpeg_roundtrip_property(h, w, seed):
        """decode(encode(x)) always yields the right shape/dtype and a
        bit-identical result on repeat (determinism), for arbitrary dims."""
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.uint8)
        d1 = jpeg_decode(jpeg_encode(px))
        assert d1.shape == (h, w) and d1.dtype == np.uint8
        assert np.array_equal(d1, jpeg_decode(jpeg_encode(px)))


def test_jpeg_decode_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode_features,
    )

    rows = jpeg_decode_features(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        px = _block_constant(r["doc_id"])
        assert (r["width"], r["height"], r["channels"]) == (JPEG_W, JPEG_H, 1)
        assert r["mean_pixel"] == int(px.sum(dtype="int64")) / px.size


# -- color (YCbCr 4:4:4) --------------------------------------------------

def test_jpeg_color_exact_on_gray_valued_even_offsets():
    """Gray-valued RGB with even offsets exercises every color-path stage
    (both quant tables, all four Huffman tables, interleaved MCUs,
    YCbCr↔RGB) and must survive BIT-EXACT: Y equals the gray value and
    the chroma planes quantize to all-zero blocks."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    b = np.arange(6)
    vals = (128 + 2 * ((b % 64) - 32)).astype(np.uint8)
    px = vals.reshape(2, 3).repeat(8, 0).repeat(8, 1)
    rgb = np.stack([px] * 3, axis=-1)
    out = jpeg_decode(jpeg_encode_color(rgb))
    assert out.shape == rgb.shape
    assert np.array_equal(out, rgb)


def test_jpeg_color_lossy_bounded():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    rng = np.random.default_rng(5)
    base = np.zeros((24, 32, 3), np.uint8)
    base[:, :16] = [200, 40, 40]
    base[:, 16:] = [30, 60, 190]
    flat = jpeg_decode(jpeg_encode_color(base))
    assert np.abs(flat.astype(int) - base.astype(int)).max() <= 4
    noisy = np.clip(
        base.astype(int) + rng.integers(-8, 9, base.shape), 0, 255
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_color(noisy))
    diff = np.abs(out.astype(int) - noisy.astype(int))
    assert diff.mean() < 8 and diff.max() < 64


def test_jpeg_color_header_structure():
    """The container must declare 2 quant tables, 4 Huffman tables, and a
    3-component SOF with 4:4:4 sampling."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_encode_color,
    )

    payload = jpeg_encode_color(np.zeros((8, 8, 3), np.uint8))
    assert payload.count(b"\xff\xdb") == 2
    assert payload.count(b"\xff\xc4") == 4
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 9] == 3  # ncomp
    # every component 0x11 sampling
    assert payload[sof + 11] == 0x11
    assert payload[sof + 14] == 0x11
    assert payload[sof + 17] == 0x11


def test_jpeg_420_exact_on_macroblock_constant_gray():
    """The 4:2:0 path is bit-exact on the 16×16-macroblock-constant
    gray-valued construction (Y exact by the even-offset argument,
    chroma constant 128 through downsample/quantize/upsample)."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    rng = np.random.default_rng(11)
    vals = (128 + 2 * rng.integers(-32, 32, size=(3, 2))).astype(np.uint8)
    px = np.repeat(np.repeat(vals, 16, axis=0), 16, axis=1)
    rgb = np.stack([px] * 3, axis=-1)
    out = jpeg_decode(jpeg_encode_color(rgb, subsampling="420"))
    assert out.shape == rgb.shape
    assert np.array_equal(out, rgb)


def test_jpeg_420_header_structure():
    """SOF advertises 0x22 luma / 0x11 chroma sampling."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_encode_color,
    )

    payload = jpeg_encode_color(
        np.zeros((16, 16, 3), np.uint8), subsampling="420"
    )
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 9] == 3  # ncomp
    assert payload[sof + 11] == 0x22  # luma 2x2
    assert payload[sof + 14] == 0x11
    assert payload[sof + 17] == 0x11


def test_jpeg_420_smooth_image_bounded():
    """Real-color 4:2:0 round trip: quality-50 quantization + chroma
    subsampling on a smooth gradient stays within a tight tolerance."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    yy, xx = np.mgrid[0:48, 0:64]
    rgb = np.stack(
        [
            (yy * 2 + 40) % 200 // 2 + 50,
            (xx * 2 + 80) % 200 // 2 + 30,
            ((yy + xx) + 60) % 200 // 2 + 40,
        ],
        axis=-1,
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_color(rgb, subsampling="420"))
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.mean() < 8.0, err.mean()


def test_jpeg_420_odd_dimensions_crop():
    """Dims that are multiples of neither 8 nor 16 pad to the MCU grid
    internally and crop back exactly."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    rgb = np.full((19, 27, 3), 100, np.uint8)
    out = jpeg_decode(jpeg_encode_color(rgb, subsampling="420"))
    assert out.shape == (19, 27, 3)
    assert np.abs(out.astype(int) - 100).max() <= 2


def test_jpeg_non_integer_sampling_ratio_rejected():
    """Sampling factor combinations with a non-integer upsampling ratio
    (here 3:2) raise the honest gate before any entropy decoding."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    payload = bytearray(jpeg_encode_color(np.zeros((8, 8, 3), np.uint8)))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 11] = 0x33  # luma 3x3
    payload[sof + 14] = 0x22  # chroma 2x2 → ratio 3/2
    with pytest.raises(ValueError, match="non-integer"):
        jpeg_decode(bytes(payload))


def test_jpeg_progressive_equals_baseline_everywhere():
    """The anchor equality: the progressive encoder quantizes identically
    to the baseline encoder, so decoding its SOF2 multi-scan stream must
    reproduce the baseline decode BIT FOR BIT — gray, 4:4:4, and 4:2:0,
    across shapes hitting every padding regime."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_color,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(42)
    for h, w in [(8, 8), (16, 16), (11, 29), (40, 24), (17, 50)]:
        g = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        assert np.array_equal(
            jpeg_decode(jpeg_encode_progressive(g)),
            jpeg_decode(jpeg_encode(g)),
        ), (h, w, "gray")
        rgb = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(
            jpeg_decode(jpeg_encode_progressive(rgb)),
            jpeg_decode(jpeg_encode_color(rgb)),
        ), (h, w, "444")
        assert np.array_equal(
            jpeg_decode(jpeg_encode_progressive(rgb, subsampling="420")),
            jpeg_decode(jpeg_encode_color(rgb, subsampling="420")),
        ), (h, w, "420")


def test_jpeg_progressive_header_is_sof2_multiscan():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_encode_progressive,
    )

    payload = jpeg_encode_progressive(
        np.zeros((16, 16, 3), np.uint8), subsampling="420"
    )
    assert b"\xff\xc2" in payload  # SOF2
    assert b"\xff\xc0" not in payload
    # DC first + 4 AC first + DC refine + 3 AC refine = 9 scans
    assert payload.count(b"\xff\xda") == 9


def test_jpeg_progressive_eobrun_spans_blocks():
    """A constant image makes every AC-first scan a single maximal EOB
    run across all blocks — the EOBRUN>1 decode path — and must still
    reconstruct exactly (constant 128+even offset is quantization-exact)."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    img = np.full((64, 80), 140, np.uint8)  # 80 blocks → EOB run of 80
    out = jpeg_decode(jpeg_encode_progressive(img))
    assert np.array_equal(out, img)


def test_jpeg_progressive_decode_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        JPEG420_H,
        JPEG420_W,
        jpeg_progressive_decode_features,
    )

    rows = jpeg_progressive_decode_features(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert (r["width"], r["height"], r["channels"]) == (
            JPEG420_W,
            JPEG420_H,
            3,
        )
        assert r["mean_r"] == r["mean_g"] == r["mean_b"]


def test_jpeg420_decode_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        JPEG420_H,
        JPEG420_W,
        jpeg420_decode_features,
    )

    rows = jpeg420_decode_features(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert (r["width"], r["height"], r["channels"]) == (
            JPEG420_W,
            JPEG420_H,
            3,
        )
        assert r["mean_r"] == r["mean_g"] == r["mean_b"]


def test_jpeg_color_odd_dimensions_crop():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_color,
    )

    rgb = np.full((11, 13, 3), 100, np.uint8)
    out = jpeg_decode(jpeg_encode_color(rgb))
    assert out.shape == (11, 13, 3)
    assert np.abs(out.astype(int) - 100).max() <= 2


def test_jpeg_color_decode_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        JPEG_H,
        JPEG_W,
        jpeg_color_decode_features,
    )

    rows = jpeg_color_decode_features(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert (r["width"], r["height"], r["channels"]) == (JPEG_W, JPEG_H, 3)
        assert r["mean_r"] == r["mean_g"] == r["mean_b"]


def test_jpeg_lone_trailing_ff_raises_valueerror():
    """A scan whose entropy segment ends with a lone 0xFF (no marker
    byte) must raise a descriptive ValueError, not TypeError."""
    px = _block_constant(3)
    buf = bytearray(jpeg_encode(px))
    eoi = buf.rfind(b"\xff\xd9")
    assert eoi > 0
    # chop the EOI and the tail of the entropy data so the decoder is
    # still hungry for bits, then end the stream with a bare 0xFF
    truncated = bytes(buf[: eoi - 4]) + b"\xff"
    with pytest.raises(ValueError):
        jpeg_decode(truncated)
