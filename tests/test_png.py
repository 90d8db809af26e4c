"""Pure-stdlib PNG codec: round-trip across every scanline filter and
color type, decode through the Spark mapInPandas path, and the
synthesize→decode E2E query — all with NO codec library (the round-4
multimodal gap: decode was a PIL-gated stub; PNG now decodes natively)."""

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    decode_image,
    png_decode,
    png_encode,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_color_types(filter_type, channels):
    rng = np.random.default_rng(42 * channels + filter_type)
    arr = rng.integers(0, 256, size=(7, 5, channels), dtype=np.uint8)
    payload = png_encode(arr, filter_type=filter_type)
    w, h, ch, px = png_decode(payload)
    assert (w, h, ch) == (5, 7, channels)
    assert np.array_equal(px, arr)


def test_png_decode_multi_idat_and_grayscale_2d():
    """A 2-D input encodes as grayscale; splitting IDAT across chunks (legal
    per spec) must decode identically."""
    import struct
    import zlib

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = png_encode(arr, filter_type=2)
    _, _, _, px = png_decode(payload)
    assert np.array_equal(px[:, :, 0], arr)
    # re-frame the IDAT as two chunks
    sig, rest = payload[:8], payload[8:]
    chunks = []
    pos = 0
    while pos + 8 <= len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        typ = rest[pos + 4 : pos + 8]
        data = rest[pos + 8 : pos + 8 + ln]
        chunks.append((typ, data))
        pos += 12 + ln

    def mk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    out = sig
    for typ, data in chunks:
        if typ == b"IDAT":
            mid = len(data) // 2
            out += mk(b"IDAT", data[:mid]) + mk(b"IDAT", data[mid:])
        else:
            out += mk(typ, data)
    _, _, _, px2 = png_decode(out)
    assert np.array_equal(px2[:, :, 0], arr)


def test_png_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"GIF89a....")
    # sub-byte depth on a non-grayscale color type is a spec violation
    # (16-bit decodes natively since round 10) — explicit raise
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 6, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="depth=4 color=6"):
        png_decode(payload)


def test_decode_image_dispatches_png_without_pil():
    """decode_image no longer raises on PNG — every still-image format
    decodes natively now, including lossy key-frame VP8 (round 10), so
    a malformed VP8 chunk fails as CORRUPTION, not a format gate."""
    arr = np.full((3, 3, 3), 200, dtype=np.uint8)
    w, h, ch, px = decode_image(png_encode(arr))
    assert (w, h, ch) == (3, 3, 3)
    assert np.array_equal(px, arr)
    with pytest.raises(ValueError, match="vp8"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 fake webp bytes")
    # truncated JPEG dispatches to the native decoder and fails LOUDLY
    # with a codec error, not an IndexError
    with pytest.raises(ValueError, match="jpeg"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @st.composite
    def _images(draw):
        h = draw(st.integers(1, 12))
        w = draw(st.integers(1, 12))
        ch = draw(st.sampled_from([1, 2, 3, 4]))
        data = draw(
            st.binary(min_size=h * w * ch, max_size=h * w * ch)
        )
        return np.frombuffer(data, np.uint8).reshape(h, w, ch)

    @given(arr=_images(), filter_type=st.integers(0, 4))
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_property(arr, filter_type):
        """Any 8-bit image round-trips bit-exactly through every filter."""
        w, h, ch, px = png_decode(png_encode(arr, filter_type=filter_type))
        assert (h, w, ch) == arr.shape
        assert np.array_equal(px, arr)

    @given(
        n=st.integers(1, 300),
        ch=st.sampled_from([1, 2]),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip_property(n, ch, rate, seed):
        from national_caseload_data_ingest_spark.operators.multimodal import (
            wav_decode,
            wav_encode,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
        got_rate, got_ch, s = wav_decode(wav_encode(arr, rate))
        assert (got_rate, got_ch) == (rate, ch)
        assert np.array_equal(s, arr)


def test_resize_png_nearest_neighbor():
    """resize_image works natively on PNG (no PIL): exact 2x up/downscale
    of a checkerboard has a closed-form expectation."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        resize_image,
    )

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    arr[0, 1] = arr[1, 0] = 255
    up = resize_image(png_encode(arr), 4, 4)
    w, h, ch, px = png_decode(up)
    assert (w, h, ch) == (4, 4, 3)
    assert np.array_equal(px[:2, :2], np.repeat(arr[:1], 2, 0)[:, [0, 0]])
    assert np.array_equal(px, np.repeat(np.repeat(arr, 2, 0), 2, 1))
    # downscale back
    _, _, _, back = png_decode(resize_image(up, 2, 2))
    assert np.array_equal(back, arr)


def test_wav_roundtrip_mono_and_stereo():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    rate, ch, s = wav_decode(wav_encode(mono, 16000))
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    rate, ch, s = wav_decode(wav_encode(stereo, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(s, stereo)


def test_wav_decode_rejects_non_pcm16():
    import io
    import wave

    from national_caseload_data_ingest_spark.operators.multimodal import (
        wav_decode,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)  # 8-bit
        wf.setframerate(8000)
        wf.writeframes(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="16-bit"):
        wav_decode(buf.getvalue())


def test_wav_decode_features_query(spark):
    """The synthesize→decode audio pipeline matches the closed form (the
    driver also hash-checks this against the DuckDB oracle)."""
    import math

    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.operators.multimodal import (
        AUDIO_N_SAMPLES,
        AUDIO_RATE,
    )

    rows = {
        r["doc_id"]: r
        for r in ent.queries()["wav_decode_features"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) > 0
    for doc_id, r in list(rows.items())[:10]:
        samples = [
            (doc_id * 7 + k * 13) % 65536 - 32768
            for k in range(AUDIO_N_SAMPLES)
        ]
        want_rms = math.sqrt(
            sum(s * s for s in samples) / AUDIO_N_SAMPLES
        )
        assert (r["sample_rate"], r["channels"], r["n_samples"]) == (
            AUDIO_RATE, 1, AUDIO_N_SAMPLES,
        )
        assert r["peak"] == max(abs(s) for s in samples)
        assert r["rms"] == pytest.approx(want_rms, rel=1e-12)


def test_png_decode_features_query(spark):
    """The synthesize→decode pipeline matches the closed form on real doc
    ids (the driver also hash-checks this against the DuckDB oracle)."""
    import __spark_entry__ as ent

    rows = {
        r["doc_id"]: r
        for r in ent.queries()["png_decode_features"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) > 0
    n = IMG_W * IMG_H
    for doc_id, r in list(rows.items())[:20]:
        want = sum((doc_id + k) % 256 for k in range(n)) / n
        assert (r["width"], r["height"], r["channels"]) == (IMG_W, IMG_H, 1)
        assert r["mean_pixel"] == pytest.approx(want, abs=0)


@pytest.mark.parametrize("size", [(1, 1), (3, 5), (5, 3), (7, 9), (8, 8),
                                  (16, 12), (17, 13)])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_adam7_roundtrip_exact(size, channels):
    """Adam7 interlaced streams decode to EXACTLY the source pixels at
    every geometry class — including sizes where several passes are
    empty (1x1 keeps only pass 1) and sizes not divisible by 8."""
    h, w = size
    rng = np.random.default_rng(h * 31 + w * 7 + channels)
    arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    for filter_type in range(5):
        payload = png_encode(arr, filter_type=filter_type, interlace=True)
        dw, dh, ch, px = png_decode(payload)
        assert (dw, dh, ch) == (w, h, channels)
        assert np.array_equal(px, arr)


def test_png_adam7_pass_permutation():
    """Position-coded pixels prove the SEVEN passes land on exactly the
    spec's strided grid cells: encode an image whose pixel (x, y) value
    is its Adam7 pass number, decode, and check every pixel announces
    the pass that should own it — any swapped or shifted pass breaks
    this, while multiset-preserving bugs would pass a mean check."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        _ADAM7,
    )

    h, w = 16, 16
    owner = np.zeros((h, w), dtype=np.uint8)
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
        owner[y0::dy, x0::dx] = p * 10
    # every pass owns at least one pixel at 16x16, and pass 1's cell is
    # only (0,0) scaled
    assert set(np.unique(owner)) == {10, 20, 30, 40, 50, 60, 70}
    payload = png_encode(owner, filter_type=1, interlace=True)
    _, _, _, px = png_decode(payload)
    assert np.array_equal(px[:, :, 0], owner)
    # interlaced and sequential encodings of the same pixels decode
    # identically
    seq = png_decode(png_encode(owner, filter_type=1))[3]
    assert np.array_equal(px, seq)


def test_png_adam7_weighted_sum_detects_misplacement():
    """The query-level guard: weighted_sum is position-sensitive, so a
    decoder producing the right pixel MULTISET at wrong positions (the
    Adam7 bug class the permutation-invariant mean cannot see) changes
    it."""
    arr = (np.arange(IMG_W * IMG_H, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(IMG_H, IMG_W)
    _, _, _, good = png_decode(png_encode(arr, filter_type=0,
                                          interlace=True))
    k = np.arange(arr.size, dtype=np.int64)
    ws_good = int((k * good.reshape(-1).astype(np.int64)).sum())
    ws_seq = int((k * arr.reshape(-1).astype(np.int64)).sum())
    assert ws_good == ws_seq  # correct decode reproduces positions
    # a pass-order scramble preserves the multiset but not weighted_sum
    scrambled = good.reshape(-1).copy()
    scrambled[:50] = scrambled[:50][::-1]
    assert int((k * scrambled.astype(np.int64)).sum()) != ws_good


# ---------------------------------------------------------------------------
# paletted PNGs (round-10: color type 3, depths 1/2/4/8, tRNS alpha)
# ---------------------------------------------------------------------------


def _pal(m):
    j = np.arange(m, dtype=np.int64)
    return np.stack([(j * 7) % 256, (j * 11) % 256, (j * 13) % 256],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_palette_roundtrip(depth, filter_type, interlace):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        png_encode_palette,
    )

    rng = np.random.default_rng(depth * 10 + filter_type)
    m = 1 << depth
    idx = rng.integers(0, m, (11, 13)).astype(np.uint8)
    p = png_encode_palette(idx, _pal(m), depth=depth,
                           filter_type=filter_type, interlace=interlace)
    w, h, ch, px = png_decode(p)
    assert (w, h, ch) == (13, 11, 3)
    assert np.array_equal(px, _pal(m)[idx])


@pytest.mark.parametrize("depth", [1, 4, 8])
def test_png_palette_trns_alpha(depth):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        png_encode_palette,
    )

    m = 1 << depth
    idx = (np.arange(9 * 7, dtype=np.int64) % m).astype(
        np.uint8).reshape(9, 7)
    trns = [(j * 5) % 256 for j in range(m)]
    p = png_encode_palette(idx, _pal(m), trns=trns, depth=depth)
    w, h, ch, px = png_decode(p)
    assert ch == 4
    assert np.array_equal(px[:, :, :3], _pal(m)[idx])
    assert np.array_equal(px[:, :, 3], np.array(trns, np.uint8)[idx])


def test_png_palette_short_trns_pads_opaque():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        png_encode_palette,
    )

    idx = np.array([[0, 1, 2, 3]], np.uint8)
    p = png_encode_palette(idx, _pal(4), trns=[0, 128], depth=2)
    _, _, ch, px = png_decode(p)
    assert ch == 4
    assert px[0, :, 3].tolist() == [0, 128, 255, 255]


def test_png_palette_rejects_bad_streams():
    import struct
    import zlib

    from national_caseload_data_ingest_spark.operators.multimodal import (
        PNG_SIGNATURE,
        png_encode_palette,
    )

    # index out of palette range
    idx = np.array([[3]], np.uint8)
    with pytest.raises(ValueError, match="index exceeds"):
        png_encode_palette(idx, _pal(2), depth=2)

    # hand-build a stream whose PLTE is missing
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    raw = zlib.compress(b"\x00\x00")
    payload = (PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        png_decode(payload)

    # 16-bit palette depth is a loud gate
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    payload16 = (PNG_SIGNATURE + chunk(b"IHDR", ihdr16)
                 + chunk(b"PLTE", b"\x00" * 6) + chunk(b"IDAT", raw)
                 + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth 1/2/4/8"):
        png_decode(payload16)


def test_png_palette_index_out_of_plte_range_detected():
    """A stream whose indices exceed the PLTE entry count is corrupt,
    not a crash."""
    import struct
    import zlib

    from national_caseload_data_ingest_spark.operators.multimodal import (
        PNG_SIGNATURE,
    )

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    raw = zlib.compress(b"\x00\x05")  # filter 0, index 5 with 2 entries
    payload = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", b"\x00" * 6) + chunk(b"IDAT", raw)
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index out of range"):
        png_decode(payload)


# ---------------------------------------------------------------------------
# non-8-bit sample depths (round-10: 16-bit everywhere, 1/2/4 grayscale)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_subbyte_gray_roundtrip(depth, filter_type, interlace):
    rng = np.random.default_rng(depth * 100 + filter_type)
    a = rng.integers(0, 1 << depth, (11, 13)).astype(np.uint8)
    p = png_encode(a, filter_type=filter_type, interlace=interlace,
                   depth=depth)
    w, h, ch, px = png_decode(p)
    assert (w, h, ch) == (13, 11, 1)
    # exact max-value rescale: 255 divisible by 1/3/15
    assert np.array_equal(px[:, :, 0], a * (255 // ((1 << depth) - 1)))


@pytest.mark.parametrize("nch", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_16bit_roundtrip(nch, filter_type, interlace):
    rng = np.random.default_rng(nch * 100 + filter_type)
    a = rng.integers(0, 65536, (9, 7, nch)).astype(np.uint16)
    p = png_encode(a, filter_type=filter_type, interlace=interlace)
    w, h, ch, px = png_decode(p)
    assert (w, h, ch) == (7, 9, nch)
    assert px.dtype == np.uint16
    assert np.array_equal(px, a)


def test_png_16bit_is_not_byteswapped():
    """A value whose two bytes differ pins the big-endian read."""
    a = np.array([[0x0102]], np.uint16)
    _, _, _, px = png_decode(png_encode(a))
    assert int(px[0, 0, 0]) == 0x0102


def test_png_encode_subbyte_rejects_bad_input():
    with pytest.raises(ValueError, match="single-channel"):
        png_encode(np.zeros((2, 2, 3), np.uint8), depth=4)
    with pytest.raises(ValueError, match="exceeds bit depth"):
        png_encode(np.array([[4]], np.uint8), depth=2)


def test_png_subbyte_color_types_still_gate():
    """Sub-byte depths are grayscale-only per the spec; an RGB stream
    claiming depth 4 is a loud gate, not a silent mis-decode."""
    import struct
    import zlib

    from national_caseload_data_ingest_spark.operators.multimodal import (
        PNG_SIGNATURE,
    )

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
    raw = zlib.compress(b"\x00\x00\x00")
    payload = (PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
               + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth=4 color=2"):
        png_decode(payload)
