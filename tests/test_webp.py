"""WEBP lossless (VP8L) codec: prefix machinery, the short-distance
table against the spec's published constants, every transform inverse,
LZ77/cache paths, a hand-crafted meta-prefix-group stream, honest gates,
and the oracle-checked query.  Format reference: RFC 9649."""

import struct

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.webp import (
    _DIST_MAP,
    _BitReader,
    _BitWriter,
    _build_huffman_lengths,
    _encode_image_stream,
    _plane_code_to_distance,
    _PrefixDecoder,
    _PrefixEncoder,
    _read_prefix_lengths,
    _write_prefix_code,
    webp_decode,
    webp_encode,
)

RNG = np.random.default_rng(13)


def _roundtrip(arr, **kw):
    w, h, ch, out = webp_decode(webp_encode(arr, **kw))
    assert (w, h, ch) == (arr.shape[1], arr.shape[0], arr.shape[2])
    assert np.array_equal(out, arr)


# ------------------------------------------------------------- primitives


def test_distance_map_matches_spec_prefix():
    """First 24 entries of the published table (webp-lossless-bitstream-
    spec §4.2.2 'the mapping between distance codes and neighboring
    pixel offsets')."""
    spec_prefix = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert _DIST_MAP[: len(spec_prefix)] == spec_prefix
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_plane_code_mapping():
    # code > 120: literal distance
    assert _plane_code_to_distance(50, 121) == 1
    assert _plane_code_to_distance(50, 200) == 80
    # code 1 = (0,1): one row up
    assert _plane_code_to_distance(50, 1) == 50
    # code 2 = (1,0): previous pixel
    assert _plane_code_to_distance(50, 2) == 1
    # code 4 = (-1,1): row up, one right → w + 1
    assert _plane_code_to_distance(50, 4) == 51


def test_prefix_code_roundtrip_random():
    for _ in range(10):
        nsym = int(RNG.integers(2, 250))
        syms = sorted(RNG.choice(280, size=nsym, replace=False).tolist())
        lengths = _build_huffman_lengths(
            {s: int(RNG.integers(1, 100)) for s in syms}
        )
        bw = _BitWriter()
        codes = _write_prefix_code(bw, lengths, 280)
        enc = _PrefixEncoder(bw, codes)
        stream = [int(s) for s in RNG.choice(syms, size=200)]
        for s in stream:
            enc.write(s)
        br = _BitReader(bw.flush() + b"\x00" * 4)
        assert _read_prefix_lengths(br, 280) == lengths
        # decode continues from the same reader position
        dec = _PrefixDecoder(lengths)
        assert [dec.decode(br) for _ in stream] == stream


def test_kraft_sum_always_complete():
    """VP8L requires complete prefix codes; the length-limiter must keep
    the Kraft sum exactly 1 even for skewed frequencies."""
    for _ in range(20):
        nsym = int(RNG.integers(2, 280))
        freqs = {
            s: int(RNG.integers(1, 10)) ** int(RNG.integers(1, 7))
            for s in range(nsym)
        }
        lengths = _build_huffman_lengths(freqs)
        assert sum(2.0 ** -l for l in lengths.values()) == pytest.approx(1.0)
        assert max(lengths.values()) <= 15


def test_kraft_exact_under_forced_clamping():
    """Fibonacci frequencies build the deepest possible Huffman tree, so
    alphabets past ~17 symbols force the max_len clamp and both repair
    loops; the sum must land on EXACTLY 1 (integer arithmetic), never
    an incomplete code — VP8L decoders reject under-subscribed codes."""
    fib = [1, 1]
    while len(fib) < 40:
        fib.append(fib[-1] + fib[-2])
    for n in range(18, 41):
        lengths = _build_huffman_lengths({s: fib[s] for s in range(n)})
        kraft = sum(1 << (15 - l) for l in lengths.values())
        assert kraft == 1 << 15, (n, kraft)
        assert max(lengths.values()) <= 15
        assert min(lengths.values()) >= 1


# ------------------------------------------------------------- roundtrips


def test_roundtrip_literals_and_lz77():
    a = RNG.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _roundtrip(a, use_lz77=False)
    _roundtrip(a, use_lz77=True)


def test_roundtrip_repetitive_exercises_copies():
    tile = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    _roundtrip(np.tile(tile, (5, 6, 1)))


def test_roundtrip_rgba():
    _roundtrip(RNG.integers(0, 256, (9, 11, 4), dtype=np.uint8))


def test_roundtrip_color_cache():
    tile = RNG.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    _roundtrip(np.tile(tile, (4, 4, 1)), cache_bits=6)


def test_roundtrip_subtract_green():
    _roundtrip(RNG.integers(0, 256, (8, 21, 3), dtype=np.uint8),
               subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    a = RNG.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    _roundtrip(a, predictor_mode=mode)
    _roundtrip(a, predictor_mode=mode, subtract_green=True)


@pytest.mark.parametrize("ncolors", [2, 3, 4, 7, 16, 17, 130])
def test_roundtrip_palette_all_packings(ncolors):
    """Palette sizes straddling every width_bits boundary (8/4/2/1
    indices per packed pixel)."""
    pal = RNG.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = RNG.integers(0, ncolors, (11, 23))
    _roundtrip(pal[idx], palette=True)


def test_roundtrip_smooth_image_predictor_compresses():
    """Sanity: the predictor transform on a smooth gradient shrinks the
    stream vs raw literals (the point of the transform)."""
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    plain = webp_encode(img, use_lz77=False)
    pred = webp_encode(img, use_lz77=False, predictor_mode=12)
    _roundtrip(img, predictor_mode=12)
    assert len(pred) < len(plain)


def test_clamp_add_subtract_half_truncates_toward_zero():
    """Predictor 13 (ClampAddSubtractHalf) against clean-room libwebp
    semantics: C ``(a - b) / 2`` truncates TOWARD ZERO, so negative
    deltas must use ``(d + 1) // 2``, never floor.  Hard constants
    first (the exact cases the pre-fix code got wrong), then a sweep
    vs an independent ``int(d / 2)`` reimplementation."""
    from national_caseload_data_ingest_spark.operators.webp import (
        _avg2,
        _predict,
    )

    def pack(v):  # same value in every channel
        return (v << 24) | (v << 16) | (v << 8) | v

    # (left, top, tl) -> expected channel value per libwebp:
    #   ave = (left + top) >> 1; clip255(ave + trunc((ave - tl) / 2))
    hard = [
        (10, 10, 14),  # d = -4 -> 10 + (-2) = 8   (floor bug gave 7)
        (10, 10, 13),  # d = -3 -> 10 + (-1) = 9
        (10, 10, 15),  # d = -5 -> 10 + (-2) = 8   (floor bug gave 7)
        (10, 10, 11),  # d = -1 -> 10 + 0 = 10     (floor bug gave 9)
        (10, 10, 12),  # d = -2 -> 10 + (-1) = 9
        (10, 10, 6),   # d = +4 -> 12
        (0, 0, 255),   # d = -255 -> clip(0 - 127) = 0
        (255, 255, 0), # d = +255 -> clip(255 + 127) = 255
    ]
    expect = [8, 9, 8, 10, 9, 12, 0, 255]
    for (l, t, tl), e in zip(hard, expect):
        got = _predict(13, pack(l), pack(t), pack(tl), 0) & 0xFF
        assert got == e, (l, t, tl, got, e)
    # exhaustive single-channel sweep vs clean-room trunc division
    for left in range(0, 256, 17):
        for top in range(3, 256, 23):
            for tl in range(5, 256, 19):
                ave = (left + top) // 2
                ref = max(0, min(255, ave + int((ave - tl) / 2)))
                got = _predict(13, pack(left), pack(top), pack(tl), 0)
                assert got & 0xFF == ref


# Frozen mode-13 stream: 8x10 descending-gradient RGB encoded with
# predictor_mode=13 AFTER the truncation fix, then pinned as bytes.
# Generation-time validation (tools/, round 9): the decode path hit 189
# negative deltas (63 odd, 126 even) and a decode with the pre-fix
# floor formula differed in 189 bytes — the vector is non-vacuous and
# NOT a shared-_predict round-trip (the bytes can never re-agree with a
# future regression on either side).
MODE13_WEBP_HEX = (
    "524946465a000000574542505650384c4d0000002f09c00100893644f43f4010"
    "6c9af2774ca58f40d334d6bf999d3e2113348df5ef63b93d18b1adaaaaaaaaaa"
    "aafa0f000080ff000000f80f000080ff000000f80f000080ff000000f80f0000"
    "0000"
)


def test_mode13_frozen_byte_vector():
    payload = bytes.fromhex(MODE13_WEBP_HEX)
    w, h, ch, out = webp_decode(payload)
    assert (w, h, ch) == (10, 8, 3)
    expected = np.zeros((8, 10, 3), dtype=np.uint8)
    for y in range(8):
        for x in range(10):
            expected[y, x, 0] = (200 - 5 * x - 3 * y) % 256
            expected[y, x, 1] = (220 - 2 * x - 3 * y) % 256
            expected[y, x, 2] = (180 - 7 * x - 1 * y) % 256
    assert np.array_equal(out, expected)


def test_meta_prefix_groups_hand_crafted():
    """Two prefix-code groups selected by a meta image: group 0 encodes
    the left half, group 1 the right half.  Hand-assembled stream —
    the encoder never emits meta groups, so this pins the decode path."""
    w = h = 16
    left_px = 0xFF112233
    right_px = 0xFF445566
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # huffman_bits = 3 → 8x8 tiles → 2x2 meta image
    # meta image stream (2x2, is_level0=False): pixels (g<<8)|... hold
    # group ids 0,1,0,1 (left column group 0, right column group 1)
    meta_px = [0xFF000000, 0xFF000100, 0xFF000000, 0xFF000100]
    _encode_image_stream(bw, meta_px, 2, False, use_lz77=False)
    # two code groups, each a set of 'simple' codes pinning one color
    for px in (left_px, right_px):
        for chan in ((px >> 8) & 0xFF, (px >> 16) & 0xFF, px & 0xFF,
                     (px >> 24) & 0xFF, 0):
            bw.write(1, 1)  # simple
            bw.write(0, 1)  # 1 symbol
            bw.write(1, 1)  # 8-bit
            bw.write(chan, 8)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    w_, h_, ch, out = webp_decode(payload)
    assert (w_, h_, ch) == (16, 16, 3)
    assert np.array_equal(out[0, 0], [0x11, 0x22, 0x33])
    assert np.array_equal(out[0, 8], [0x44, 0x55, 0x66])
    assert np.array_equal(out[15, 7], [0x11, 0x22, 0x33])
    assert np.array_equal(out[15, 15], [0x44, 0x55, 0x66])


# ------------------------------------------------------------------ gates


def test_truncated_vp8_chunk_is_corruption_not_gate():
    """Round 10: lossy VP8 key frames DECODE natively, so a truncated
    VP8 chunk is structural corruption (ValueError), no longer the old
    'lossy not supported' gate."""
    payload = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError, match="vp8"):
        webp_decode(payload)


def test_garbage_raises():
    with pytest.raises(ValueError, match="not a WEBP"):
        webp_decode(b"NOTAWEBPFILE")


def test_decode_image_dispatches_webp():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        decode_image,
    )

    a = RNG.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    w, h, ch, out = decode_image(webp_encode(a))
    assert (w, h, ch) == (7, 6, 3)
    assert np.array_equal(out, a)


# ------------------------------------------------------------------ query


def test_webp_decode_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        IMG_H,
        IMG_W,
        webp_decode_features_query,
    )

    rows = webp_decode_features_query(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:8]:
        assert (r["width"], r["height"], r["channels"]) == (IMG_W, IMG_H, 3)


# ------------------------------------------------------------------ animation


def test_animated_roundtrip_and_compositing():
    """Overwrite-blend frames composite onto a transparent canvas; the
    dispose bit clears exactly the frame rect before the next frame."""
    from national_caseload_data_ingest_spark.operators.webp import (
        webp_decode_animated,
        webp_encode_animated,
    )

    base = np.full((12, 16, 4), 200, np.uint8)
    p1 = np.zeros((4, 4, 4), np.uint8)
    p1[..., 0] = 99
    p1[..., 3] = 255
    payload = webp_encode_animated(
        16,
        12,
        [
            dict(x=0, y=0, rgba=base, duration_ms=40, blend=1),
            dict(x=4, y=4, rgba=p1, duration_ms=50, blend=1, dispose=1),
            dict(x=12, y=0, rgba=p1, duration_ms=60, blend=1),
        ],
    )
    w, h, frames = webp_decode_animated(payload)
    assert (w, h) == (16, 12)
    assert [d for d, _ in frames] == [40, 50, 60]
    assert np.array_equal(frames[0][1], base)
    # frame 2 presents the patch; frame 3's canvas has the disposed hole
    assert frames[1][1][5, 5, 0] == 99
    f3 = frames[2][1]
    assert f3[5, 5].tolist() == [0, 0, 0, 0]
    assert f3[1, 13, 0] == 99
    assert f3[0, 0, 0] == 200


def test_animated_alpha_blend_matches_src_over():
    """blend=0 frames alpha-composite: a 50%-alpha red over opaque blue
    equals the integer src-over reference computed here independently."""
    from national_caseload_data_ingest_spark.operators.webp import (
        webp_decode_animated,
        webp_encode_animated,
    )

    blue = np.zeros((4, 4, 4), np.uint8)
    blue[..., 2] = 200
    blue[..., 3] = 255
    red = np.zeros((4, 4, 4), np.uint8)
    red[..., 0] = 100
    red[..., 3] = 128
    payload = webp_encode_animated(
        4,
        4,
        [
            dict(x=0, y=0, rgba=blue, duration_ms=10, blend=1),
            dict(x=0, y=0, rgba=red, duration_ms=10, blend=0),
        ],
    )
    _, _, frames = webp_decode_animated(payload)
    got = frames[1][1][0, 0]
    a_s, a_d = 128, 255
    a_out = a_s + a_d * (255 - a_s) // 255
    r = (100 * a_s * 255 + 0 * a_d * (255 - a_s)) // (a_out * 255)
    b = (0 * a_s * 255 + 200 * a_d * (255 - a_s)) // (a_out * 255)
    assert got.tolist() == [r, 0, b, a_out]


def test_animated_gates_and_structure():
    from national_caseload_data_ingest_spark.operators.webp import (
        webp_decode_animated,
        webp_encode_animated,
    )

    f = np.full((4, 4, 4), 7, np.uint8)
    payload = webp_encode_animated(
        8, 8, [dict(x=0, y=0, rgba=f, duration_ms=5)]
    )
    # the still-image entry point refuses animated files loudly
    with pytest.raises(NotImplementedError, match="animated"):
        webp_decode(payload)
    # odd offsets are unrepresentable (container stores x/2)
    with pytest.raises(ValueError, match="even"):
        webp_encode_animated(8, 8, [dict(x=1, y=0, rgba=f, duration_ms=5)])
    # frame exceeding the canvas
    with pytest.raises(ValueError, match="canvas"):
        webp_encode_animated(4, 4, [dict(x=2, y=0, rgba=f, duration_ms=5)])
    # a TRUNCATED lossy VP8 frame inside ANMF is corruption (round 10:
    # valid lossy key frames decode — see
    # test_animated_webp_with_lossy_frames_composites)
    import struct

    anmf = (
        b"\x00\x00\x00" * 2
        + (3).to_bytes(3, "little")
        + (3).to_bytes(3, "little")
        + (5).to_bytes(3, "little")
        + b"\x02"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    vp8x = bytes([0x02]) + b"\x00\x00\x00" + (7).to_bytes(3, "little") + (
        7
    ).to_bytes(3, "little")

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    body = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANMF", anmf)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="vp8"):
        webp_decode_animated(payload)


def test_webp_animation_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        webp_animation_features,
    )

    rows = webp_animation_features(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:10]:
        assert r["n_frames"] == 3
        # odd docs disposed the moving patch: 16 transparent pixels
        expect_a = 255 * (192 - (16 if r["doc_id"] % 2 else 0))
        assert r["a_sum"] == expect_a


# ---------------------------------------------------------------------------
# lossy (VP8 key-frame) WebP — round 10
# ---------------------------------------------------------------------------


def test_lossy_webp_decodes_through_container():
    from national_caseload_data_ingest_spark.operators.vp8 import (
        vp8_build_keyframe,
    )
    from national_caseload_data_ingest_spark.operators.vp8_tables import (
        DC_PRED, TM_PRED,
    )
    from national_caseload_data_ingest_spark.operators.webp import (
        webp_decode, webp_encode_lossy,
    )

    mbs = [dict(ymode=[DC_PRED, TM_PRED][k % 2], uv_mode=DC_PRED,
                y2=[k + 1] + [0] * 15) for k in range(4)]
    payload = webp_encode_lossy(vp8_build_keyframe(32, 32, mbs, y_ac_qi=20))
    w, h, ch, px = webp_decode(payload)
    assert (w, h, ch) == (32, 32, 3)
    assert px.shape == (32, 32, 3)
    # flat chroma at 128 -> all three channels equal
    assert np.array_equal(px[..., 0], px[..., 1])
    assert np.array_equal(px[..., 0], px[..., 2])


def test_lossy_webp_inter_frame_gates():
    from national_caseload_data_ingest_spark.operators.vp8 import (
        vp8_build_keyframe,
    )
    from national_caseload_data_ingest_spark.operators.vp8_tables import (
        DC_PRED,
    )
    from national_caseload_data_ingest_spark.operators.webp import (
        webp_decode, webp_encode_lossy,
    )

    kf = bytearray(vp8_build_keyframe(
        16, 16, [dict(ymode=DC_PRED, uv_mode=DC_PRED)]))
    kf[0] |= 1  # inter frame
    with pytest.raises(NotImplementedError, match="inter frame"):
        webp_decode(webp_encode_lossy(bytes(kf)))


def test_animated_webp_with_lossy_frames_composites():
    """ANMF frames carrying VP8 key frames decode and composite (fully
    opaque) next to VP8L frames in the same animation."""
    import struct

    from national_caseload_data_ingest_spark.operators.vp8 import (
        vp8_build_keyframe,
    )
    from national_caseload_data_ingest_spark.operators.vp8_tables import (
        DC_PRED,
    )
    from national_caseload_data_ingest_spark.operators.webp import (
        _bare_vp8l_chunk, webp_decode_animated,
    )

    # hand-assemble VP8X/ANIM + one VP8L frame + one lossy VP8 frame
    def u24(v):
        return v.to_bytes(3, "little")

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    cw = ch = 32
    vp8x = chunk(b"VP8X", bytes([0x02, 0, 0, 0]) + u24(cw - 1) + u24(ch - 1))
    anim = chunk(b"ANIM", b"\x00\x00\x00\x00\x00\x00")
    rgba = np.full((32, 32, 4), 9, np.uint8)
    f1 = chunk(b"ANMF", u24(0) + u24(0) + u24(31) + u24(31) + u24(40)
               + bytes([0x02]) + _bare_vp8l_chunk(rgba))
    mbs = [dict(ymode=DC_PRED, uv_mode=DC_PRED, y2=[2] + [0] * 15)
           for _ in range(4)]
    vp8 = vp8_build_keyframe(32, 32, mbs, y_ac_qi=20)
    f2 = chunk(b"ANMF", u24(0) + u24(0) + u24(31) + u24(31) + u24(50)
               + bytes([0x02]) + chunk(b"VP8 ", vp8))
    body = vp8x + anim + f1 + f2
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    w, h, frames = webp_decode_animated(payload)
    assert (w, h) == (32, 32)
    assert [d for d, _ in frames] == [40, 50]
    assert np.unique(frames[0][1][..., 0]).tolist() == [9]
    # frame 2 replaced the canvas with the decoded lossy pixels (opaque)
    assert np.unique(frames[1][1][..., 3]).tolist() == [255]
    assert frames[1][1][..., 0].mean() > 100


def test_empty_alph_chunk_raises_valueerror():
    from national_caseload_data_ingest_spark.operators.webp import (
        _decode_alpha,
    )

    with pytest.raises(ValueError, match="empty ALPH"):
        _decode_alpha(b"", 4, 4)
