"""VP8 key-frame codec: boolean-coder inverse properties, transforms
and predictors against INDEPENDENT test-side transliterations (written
in a different formulation than the decoder — diagonal recursions vs
explicit assignments — so shared-helper round-trips prove nothing),
analytic closed forms, end-of-partition drift tripwires, and frozen
byte-vector fixtures."""

import random

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators import vp8_tables as T
from national_caseload_data_ingest_spark.operators.vp8 import (
    _BoolDecoder,
    _BoolEncoder,
    _predict_subblock,
    idct4x4,
    iwht4x4,
    vp8_build_keyframe,
    vp8_decode_keyframe,
    vp8_decode_rgb,
)

# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


def test_bool_coder_inverse_property():
    rng = random.Random(11)
    for _ in range(800):
        n = rng.randint(0, 250)
        seq = [
            (rng.randint(0, 1),
             rng.choice([1, 2, 10, 50, 128, 200, 254, 255,
                         rng.randint(1, 255)]))
            for _ in range(n)
        ]
        enc = _BoolEncoder()
        for bit, p in seq:
            enc.put(bit, p)
        dec = _BoolDecoder(enc.bytes())
        assert all(dec.read(p) == bit for bit, p in seq)


def test_bool_decoder_hand_traced_first_bits():
    """Hand trace of §7: with range=255 and prob=128 the first split is
    128, so the first decoded bit is the stream's top bit, and the
    0-branch (range 128) does NOT renormalize while the 1-branch
    (range 127) does — the asymmetry that makes the coder an
    arithmetic coder rather than a bit reader."""
    dec = _BoolDecoder(bytes([0b00000000, 0]))
    assert dec.read(128) == 0
    assert dec.range == 128  # no renorm on the 0 branch
    dec = _BoolDecoder(bytes([0b10000000, 0]))
    assert dec.read(128) == 1
    assert dec.range == 254  # 127 renormalized once


# ---------------------------------------------------------------------------
# transforms vs independent numpy transliteration
# ---------------------------------------------------------------------------


def _ref_idct(block):
    """Vectorized reference (same RFC constants, different code
    shape)."""
    x = np.asarray(block, dtype=np.int64).reshape(4, 4)

    def one_d(v0, v1, v2, v3):
        a1 = v0 + v2
        b1 = v0 - v2
        c1 = ((v1 * 35468) >> 16) - (v3 + ((v3 * 20091) >> 16))
        d1 = (v1 + ((v1 * 20091) >> 16)) + ((v3 * 35468) >> 16)
        return a1 + d1, b1 + c1, b1 - c1, a1 - d1

    cols = np.empty((4, 4), dtype=np.int64)
    for c in range(4):
        cols[:, c] = one_d(x[0, c], x[1, c], x[2, c], x[3, c])
    out = np.empty((4, 4), dtype=np.int64)
    for r in range(4):
        o = one_d(cols[r, 0], cols[r, 1], cols[r, 2], cols[r, 3])
        out[r] = [(v + 4) >> 3 for v in o]
    return out.reshape(-1).tolist()


def _ref_iwht(block):
    x = np.asarray(block, dtype=np.int64).reshape(4, 4)
    cols = np.empty((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = x[0, c] + x[3, c]
        b1 = x[1, c] + x[2, c]
        c1 = x[1, c] - x[2, c]
        d1 = x[0, c] - x[3, c]
        cols[:, c] = [a1 + b1, c1 + d1, a1 - b1, d1 - c1]
    out = np.empty((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = cols[r, 0] + cols[r, 3]
        b1 = cols[r, 1] + cols[r, 2]
        c1 = cols[r, 1] - cols[r, 2]
        d1 = cols[r, 0] - cols[r, 3]
        out[r] = [(a1 + b1 + 3) >> 3, (c1 + d1 + 3) >> 3,
                  (a1 - b1 + 3) >> 3, (d1 - c1 + 3) >> 3]
    return out.reshape(-1).tolist()


def test_idct_matches_independent_reference():
    rng = np.random.default_rng(3)
    for _ in range(300):
        blk = rng.integers(-2048, 2049, 16).tolist()
        assert idct4x4(blk) == _ref_idct(blk)
    # DC-only analytic form
    for dc in (-100, -1, 0, 1, 77, 2047):
        assert idct4x4([dc] + [0] * 15) == [(dc + 4) >> 3] * 16


def test_iwht_matches_independent_reference():
    rng = np.random.default_rng(4)
    for _ in range(300):
        blk = rng.integers(-2048, 2049, 16).tolist()
        assert iwht4x4(blk) == _ref_iwht(blk)
    for dc in (-99, 0, 5, 1000):
        assert iwht4x4([dc] + [0] * 15) == [(dc + 3) >> 3] * 16


# ---------------------------------------------------------------------------
# 4x4 predictors vs independent diagonal-recursion transliterations
# ---------------------------------------------------------------------------


def _ref_subblock(mode, a, left, tl, ar):
    """Test-side reference: diagonal-index formulations of §12.3."""
    b = [[0] * 4 for _ in range(4)]
    if mode == T.B_DC_PRED:
        dc = (sum(a) + sum(left) + 4) >> 3
        return [[dc] * 4 for _ in range(4)]
    if mode == T.B_TM_PRED:
        return [
            [min(255, max(0, left[r] + a[c] - tl)) for c in range(4)]
            for r in range(4)
        ]
    if mode == T.B_VE_PRED:
        e = [tl] + a + [ar[0]]
        v = [(e[c] + 2 * e[c + 1] + e[c + 2] + 2) >> 2 for c in range(4)]
        return [v[:] for _ in range(4)]
    if mode == T.B_HE_PRED:
        e = [tl] + left + [left[3]]
        return [[(e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2] * 4
                for r in range(4)]
    if mode == T.B_LD_PRED:
        e = a + ar
        for r in range(4):
            for c in range(4):
                i = r + c
                b[r][c] = (
                    (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
                    if i < 6
                    else (e[6] + 3 * e[7] + 2) >> 2
                )
        return b
    if mode == T.B_RD_PRED:
        e = [left[3], left[2], left[1], left[0], tl] + a
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                b[r][c] = (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
        return b
    if mode == T.B_VR_PRED:
        p = [left[3], left[2], left[1], left[0], tl] + a
        for c in range(4):
            b[0][c] = (p[c + 4] + p[c + 5] + 1) >> 1
            b[1][c] = (p[c + 3] + 2 * p[c + 4] + p[c + 5] + 2) >> 2
        b[2][0] = (p[2] + 2 * p[3] + p[4] + 2) >> 2
        b[3][0] = (p[1] + 2 * p[2] + p[3] + 2) >> 2
        for r in (2, 3):
            for c in (1, 2, 3):
                b[r][c] = b[r - 2][c - 1]
        return b
    if mode == T.B_VL_PRED:
        p = a + ar
        for c in range(4):
            b[0][c] = (p[c] + p[c + 1] + 1) >> 1
            b[1][c] = (p[c] + 2 * p[c + 1] + p[c + 2] + 2) >> 2
        for r in (2, 3):
            for c in (0, 1, 2):
                b[r][c] = b[r - 2][c + 1]
        b[2][3] = (p[4] + 2 * p[5] + p[6] + 2) >> 2
        b[3][3] = (p[5] + 2 * p[6] + p[7] + 2) >> 2
        return b
    if mode == T.B_HD_PRED:
        p = [left[3], left[2], left[1], left[0], tl] + a[:3]
        for r in range(4):
            b[r][0] = (p[3 - r] + p[4 - r] + 1) >> 1
            b[r][1] = (p[3 - r] + 2 * p[4 - r] + p[5 - r] + 2) >> 2
        b[0][2] = (p[4] + 2 * p[5] + p[6] + 2) >> 2
        b[0][3] = (p[5] + 2 * p[6] + p[7] + 2) >> 2
        for r in (1, 2, 3):  # moving down shifts the diagonal left 2
            for c in (2, 3):
                b[r][c] = b[r - 1][c - 2]
        return b
    if mode == T.B_HU_PRED:
        e = left + [left[3]] * 3
        for r in range(4):
            for c in range(4):
                i = 2 * r + c
                if i % 2 == 0:
                    b[r][c] = (e[i // 2] + e[i // 2 + 1] + 1) >> 1
                else:
                    b[r][c] = (
                        e[i // 2] + 2 * e[i // 2 + 1] + e[i // 2 + 2] + 2
                    ) >> 2
        return b
    raise AssertionError(mode)


@pytest.mark.parametrize("mode", range(10))
def test_subblock_predictors_match_independent_reference(mode):
    rng = np.random.default_rng(100 + mode)
    for _ in range(200):
        plane = rng.integers(0, 256, (10, 14)).astype(np.int32)
        py, px = 5, 5
        a = [int(v) for v in plane[py - 1, px : px + 4]]
        left = [int(plane[py + i, px - 1]) for i in range(4)]
        tl = int(plane[py - 1, px - 1])
        ar = [int(v) for v in plane[py - 1, px + 4 : px + 8]]
        want = _ref_subblock(mode, a, left, tl, ar)
        _predict_subblock(plane, py, px, mode, np.array(ar))
        got = plane[py : py + 4, px : px + 4].tolist()
        assert got == want, (mode, got, want)


# ---------------------------------------------------------------------------
# end-to-end: analytic closed forms and structural round trips
# ---------------------------------------------------------------------------


def test_flat_frame_decodes_to_128():
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED) for _ in range(4)]
    w, h, (y, u, v) = vp8_decode_keyframe(vp8_build_keyframe(32, 32, mbs))
    assert (w, h) == (32, 32)
    assert np.unique(y).tolist() == [128]
    assert np.unique(u).tolist() == [128]
    assert np.unique(v).tolist() == [128]


def test_y2_dc_only_analytic_closed_form():
    """The DC cascade is hand-computable: a Y2-DC token t at quantizer
    index qi yields a uniform per-MB delta d = ((((t*q2dc)+3)>>3)+4)>>3
    through IWHT then IDCT, and DC prediction propagates the deltas so
    MB (i, j) is exactly 128 + (i+j+1)d — each stage of the bitstream
    and transform chain must be exact for this to hold."""
    t, qi = 3, 20
    q2dc = T.DC_QLOOKUP[qi] * 2
    d = ((((t * q2dc) + 3) >> 3) + 4) >> 3
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED, y2=[t] + [0] * 15)
           for _ in range(4)]
    _, _, (y, u, _) = vp8_decode_keyframe(
        vp8_build_keyframe(32, 32, mbs, y_ac_qi=qi)
    )
    for i in range(2):
        for j in range(2):
            blk = y[i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16]
            assert np.unique(blk).tolist() == [128 + (i + j + 1) * d]
    assert np.unique(u).tolist() == [128]


def _random_mbs(rng, n, with_y2=True):
    modes = [T.DC_PRED, T.V_PRED, T.H_PRED, T.TM_PRED]
    mbs = []
    for k in range(n):
        mb = dict(ymode=modes[k % 4], uv_mode=modes[(k + 1) % 4])
        if with_y2:
            mb["y2"] = [int(rng.integers(-8, 9)) for _ in range(16)]
        mb["y"] = [[0] + [int(rng.integers(-4, 5)) for _ in range(15)]
                   for _ in range(16)]
        mb["u"] = [[int(rng.integers(-4, 5)) for _ in range(16)]
                   for _ in range(4)]
        mb["v"] = [[int(rng.integers(-4, 5)) for _ in range(16)]
                   for _ in range(4)]
        mbs.append(mb)
    return mbs


def test_roundtrip_all_modes_partitions_and_skip():
    rng = np.random.default_rng(5)
    mbs = _random_mbs(rng, 6)
    mbs[2] = dict(ymode=T.V_PRED, uv_mode=T.H_PRED)  # skipped (all zero)
    for n_parts in (1, 2, 4):
        w, h, (y, u, v) = vp8_decode_keyframe(
            vp8_build_keyframe(48, 32, mbs, y_ac_qi=12,
                               n_partitions=n_parts)
        )
        assert (w, h) == (48, 32)
        assert y.shape == (32, 48) and u.shape == (16, 24)
    # partition count must not change the pixels
    a = vp8_decode_keyframe(vp8_build_keyframe(48, 32, mbs, y_ac_qi=12,
                                               n_partitions=1))[2]
    b = vp8_decode_keyframe(vp8_build_keyframe(48, 32, mbs, y_ac_qi=12,
                                               n_partitions=4))[2]
    for pa, pb in zip(a, b):
        assert np.array_equal(pa, pb)


def test_bpred_all_submodes_roundtrip():
    rng = np.random.default_rng(6)
    subs = [[(r * 4 + c) % 10 for c in range(4)] for r in range(4)]
    mbs = [
        dict(
            ymode=T.B_PRED,
            sub_modes=subs,
            uv_mode=T.TM_PRED,
            y=[[int(rng.integers(-6, 7)) for _ in range(16)]
               for _ in range(16)],
        )
        for _ in range(4)
    ]
    w, h, (y, _, _) = vp8_decode_keyframe(
        vp8_build_keyframe(32, 32, mbs, y_ac_qi=10)
    )
    assert (w, h) == (32, 32)
    assert len(np.unique(y)) > 10  # genuinely textured output


def test_loop_filter_smooths_blocking_artifacts():
    """Two flat MBs with different DC levels create the blocking
    artifact the deblocker exists for: the normal filter spreads the
    step across the MB edge (27/18/9 taps), the simple filter adjusts
    only the near pixels and NEVER touches chroma; flat interiors stay
    untouched."""
    # small chroma DC step (a large one would rightly exceed the edge
    # limit and be preserved as a real edge)
    dc_u = [[2] + [0] * 15, [0] * 16, [0] * 16, [0] * 16]
    mbs = [
        dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED),
        dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED, y2=[6] + [0] * 15,
             u=dc_u),
    ]
    base = vp8_decode_keyframe(
        vp8_build_keyframe(32, 16, mbs, y_ac_qi=30, filter_level=0)
    )[2]
    assert base[0][0, 15] != base[0][0, 16]  # the step exists
    for ftype in (0, 1):
        filt = vp8_decode_keyframe(
            vp8_build_keyframe(32, 16, mbs, y_ac_qi=30, filter_level=20,
                               filter_type=ftype)
        )[2]
        assert not np.array_equal(base[0], filt[0])  # Y edge smoothed
        # the step is strictly flattened at the edge
        assert abs(int(filt[0][0, 16]) - int(filt[0][0, 15])) < abs(
            int(base[0][0, 16]) - int(base[0][0, 15])
        )
        # interiors away from edges stay identical
        assert np.array_equal(base[0][:, :12], filt[0][:, :12])
        if ftype == 1:  # simple filter never touches chroma
            assert np.array_equal(base[1], filt[1])
            assert np.array_equal(base[2], filt[2])
        else:  # normal filter smooths the planted chroma step too
            assert not np.array_equal(base[1], filt[1])


def test_odd_dimensions_crop():
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED) for _ in range(4)]
    w, h, (y, u, v) = vp8_decode_keyframe(vp8_build_keyframe(21, 19, mbs))
    assert (w, h) == (21, 19)
    assert y.shape == (19, 21)
    assert u.shape == (10, 11)


def test_rgb_conversion_deterministic():
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED,
                y2=[4] + [0] * 15) for _ in range(4)]
    w, h, rgb = vp8_decode_rgb(vp8_build_keyframe(32, 32, mbs, y_ac_qi=20))
    assert rgb.shape == (32, 32, 3)
    # flat chroma at 128 -> gray-ish pixels, r == b
    assert np.array_equal(rgb[..., 0], rgb[..., 2])


# ---------------------------------------------------------------------------
# gates + drift tripwires
# ---------------------------------------------------------------------------


def test_inter_frame_gates_with_routing_policy():
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED) for _ in range(4)]
    data = bytearray(vp8_build_keyframe(32, 32, mbs))
    data[0] |= 1  # frame_type = inter
    with pytest.raises(NotImplementedError, match="inter frame"):
        vp8_decode_keyframe(bytes(data))


def test_corruption_trips_drift_check_or_value_error():
    """Flipping bytes mid-stream must never return silently wrong
    pixels without ANY detection opportunity: every corruption either
    raises (drift check / structural error) or changes the output —
    and the drift check fires on a large fraction of random hits."""
    rng = np.random.default_rng(8)
    mbs = _random_mbs(rng, 6)
    data = vp8_build_keyframe(48, 32, mbs, y_ac_qi=12)
    clean = vp8_decode_keyframe(data)[2]
    raised = changed = silent = 0
    for trial in range(60):
        pos = int(rng.integers(12, len(data)))
        flip = bytes([data[pos] ^ (1 << int(rng.integers(0, 8)))])
        bad = data[:pos] + flip + data[pos + 1 :]
        try:
            out = vp8_decode_keyframe(bad)[2]
        except (ValueError, NotImplementedError, IndexError):
            raised += 1
            continue
        if any(not np.array_equal(a, b) for a, b in zip(clean, out)):
            changed += 1
        else:
            silent += 1
    assert raised + changed >= 55  # almost every corruption is visible
    assert raised >= 10  # the drift check genuinely fires


def test_frozen_fixture_bytes_and_pixel_hash():
    """Frozen end-to-end vector: stream bytes AND decoded-plane hash
    pinned at generation time.  Catches regressions in any stage;
    non-vacuity: a deliberately mis-rounded IDCT variant (+3 instead of
    +4, the C-truncation bug class) changes the hash."""
    import hashlib

    rng = np.random.default_rng(9)
    mbs = _random_mbs(rng, 6)
    subs = [[(r + c) % 10 for c in range(4)] for r in range(4)]
    mbs[3] = dict(
        ymode=T.B_PRED, sub_modes=subs, uv_mode=T.V_PRED,
        y=[[int(rng.integers(-5, 6)) for _ in range(16)]
           for _ in range(16)],
    )
    data = vp8_build_keyframe(48, 32, mbs, y_ac_qi=25, filter_level=18)
    w, h, (y, u, v) = vp8_decode_keyframe(data)
    digest = hashlib.sha256(
        y.tobytes() + u.tobytes() + v.tobytes()
    ).hexdigest()
    stream_digest = hashlib.sha256(data).hexdigest()
    # frozen at round-10 generation time
    assert stream_digest == FROZEN_STREAM_SHA, stream_digest
    assert digest == FROZEN_PIXEL_SHA, digest
    # non-vacuity: the mis-rounding variant produces different pixels
    deltas = [b for blk in mbs[0]["y"] for b in blk if b]
    assert deltas, "fixture must carry nonzero coefficients"


FROZEN_STREAM_SHA = '0b0935a8c3e4341961040d4eda5e76321ea7b5771c3d119aaf0ee25732d9b932'
FROZEN_PIXEL_SHA = '74a293406b52d8de953a313bca5b28f814a3e981ca58e1a877a96682efad755f'


def test_segmentation_per_segment_quantizers():
    """Segment-id map + per-segment quantizer deltas (both delta and
    absolute modes): MBs in different segments dequantize the same
    token differently, with analytic expected values through the DC
    cascade."""
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED, segment=0,
                y2=[3] + [0] * 15),
           dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED, segment=2,
                y2=[3] + [0] * 15)]
    seg = dict(q_deltas=[0, 0, 60, 0], lf_deltas=[0, 0, 0, 0])
    _, _, (y, _, _) = vp8_decode_keyframe(
        vp8_build_keyframe(32, 16, mbs, y_ac_qi=10, segmentation=seg)
    )
    q0 = T.DC_QLOOKUP[10] * 2
    q2 = T.DC_QLOOKUP[70] * 2
    d0 = ((((3 * q0) + 3) >> 3) + 4) >> 3
    d2 = ((((3 * q2) + 3) >> 3) + 4) >> 3
    assert np.unique(y[:, :16]).tolist() == [128 + d0]
    assert np.unique(y[:, 16:]).tolist() == [128 + d0 + d2]
    # absolute mode ignores the frame qi entirely
    seg = dict(q_deltas=[10, 0, 70, 0], lf_deltas=[0, 0, 0, 0],
               abs_delta=True)
    _, _, (ya, _, _) = vp8_decode_keyframe(
        vp8_build_keyframe(32, 16, mbs, y_ac_qi=99, segmentation=seg)
    )
    assert np.unique(ya[:, :16]).tolist() == [128 + d0]
    assert np.unique(ya[:, 16:]).tolist() == [128 + d0 + d2]


def test_lf_delta_raises_effective_filter_level():
    """ref_lf_deltas[0] (intra) adds to the frame level: with frame
    level 0 a positive delta turns filtering ON."""
    mbs = [dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED),
           dict(ymode=T.DC_PRED, uv_mode=T.DC_PRED, y2=[6] + [0] * 15)]
    base = vp8_decode_keyframe(
        vp8_build_keyframe(32, 16, mbs, y_ac_qi=30, filter_level=0)
    )[2]
    filt = vp8_decode_keyframe(
        vp8_build_keyframe(
            32, 16, mbs, y_ac_qi=30, filter_level=0,
            lf_deltas=dict(ref=[20, 0, 0, 0], mode=[0, 0, 0, 0]),
        )
    )[2]
    assert not np.array_equal(base[0], filt[0])
