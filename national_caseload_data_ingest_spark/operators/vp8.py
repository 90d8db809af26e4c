"""Lossy VP8 key-frame (intra) decoder — pure stdlib/numpy.

Closes the engine's last mainstream image-codec gate: still lossy WebP
and every ANMF frame of animated lossy WebP are intra-only VP8 key
frames, so a key-frame decoder covers the whole still-image lossy-WebP
population (inter frames exist only in WebM video, which the video
routing policy routes to a host — SCALING.md).

Format reference: RFC 6386 ("VP8 Data Format and Decoding Guide") —
the boolean arithmetic decoder (§7), frame header (§9), macroblock
modes (§11), token/residual decode (§13), dequantization (§14),
intra prediction (§12), inverse DCT/WHT (§14.3-14.5), and the loop
filter (§15).  Reference parity hooks cite the reference repo's gate
the way the other codec modules do (the reference delegates all codec
work — this engine decodes natively; see ``ncd/athena.py:57-79`` for
the reference's delegation surface).

Verification model (documented honestly):

- every ARITHMETIC stage — boolean coder, tree decode, dequant,
  all intra predictors, IDCT/IWHT, loop filter — is pinned by tests
  against independent RFC-transliterated reference implementations
  (``tests/test_vp8.py``) and frozen byte-vector fixtures;
- the large CONSTANT tables (token probabilities, key-frame B-mode
  probabilities, quantizer lookups) live in ``vp8_tables.py`` with
  their provenance documented there; the decoder additionally enforces
  END-OF-PARTITION position checks (a desynchronized bool decoder —
  the failure mode of any wrong table entry — drifts the partition
  read position with overwhelming probability, turning silent
  wrongness into a loud ``ValueError``).

Output contract: :func:`vp8_decode_keyframe` returns the spec-exact
YUV 4:2:0 planes (the bit-exact quantity RFC 6386 defines);
:func:`vp8_decode_rgb` converts with the engine's documented integer
BT.601 full-range conversion and point chroma upsampling (a display
choice — deterministic here, not a spec quantity).
"""

from __future__ import annotations


class _BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder.

    Reads past-the-end bits as zero (the spec's convention: a conforming
    stream never *depends* on them, but the final renorms may touch
    them).  ``pos_bytes()`` reports how many stream bytes have entered
    the window — the end-of-partition drift check compares it against
    the partition size."""

    def __init__(self, data: bytes):
        self.data = data
        self.value = 0
        self.range = 255
        self.bit_count = -8  # bits of lookahead still to load
        self.byte_pos = 0
        for _ in range(2):
            self.value = (self.value << 8) | self._next_byte()

    def _next_byte(self) -> int:
        b = self.data[self.byte_pos] if self.byte_pos < len(self.data) else 0
        self.byte_pos += 1
        return b

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 0:
                self.bit_count = -8
                self.value |= self._next_byte()
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def read_signed_literal(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read(128) else v

    def read_flagged_signed(self, n: int) -> int:
        """The header's 'flag then signed value' pattern (§9.3)."""
        return self.read_signed_literal(n) if self.read(128) else 0

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEncoder:
    """Inverse of :class:`_BoolDecoder`, used to build fixtures and the
    test encoder.  Carry-free big-integer formulation: ``low``
    accumulates split additions at the current scale and every renorm
    doubles it, so the final codeword is exactly ``low`` emitted in
    ``16 + n_shifts`` bits (consistency with the spec decoder is
    property-tested over random streams, edge probabilities included).
    """

    def __init__(self):
        self.low = 0
        self.range = 255
        self.n_shifts = 0

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.n_shifts += 1

    def put_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((value >> i) & 1, 128)

    def put_signed_literal(self, value: int, n: int) -> None:
        self.put_literal(abs(value), n)
        self.put(1 if value < 0 else 0, 128)

    def put_flagged_signed(self, value: int, n: int) -> None:
        if value:
            self.put(1, 128)
            self.put_signed_literal(value, n)
        else:
            self.put(0, 128)

    def put_tree(self, tree, probs, symbol: int, start: int = 0) -> None:
        """Encode ``symbol`` down the tree (the decoder's read_tree
        inverse): walk from ``start``, at each node choose the branch
        whose subtree contains ``-symbol``."""
        def reach(i):
            if i <= 0:
                return {-i}
            return reach(tree[i]) | reach(tree[i + 1])

        i = start
        while True:
            bit = 1 if symbol in reach(tree[i + 1]) else 0
            self.put(bit, probs[i >> 1])
            i = tree[i + bit]
            if i <= 0:
                return

    def bytes(self) -> bytes:
        # codeword = low at range scale << 8 (the decoder's value window
        # is range << 8), emitted in 16 + n_shifts bits, zero-padded to
        # a byte boundary
        total_bits = self.n_shifts + 16
        nbytes = (total_bits + 7) // 8
        pad = nbytes * 8 - total_bits
        return int((self.low << 8) << pad).to_bytes(nbytes, "big")


# ---------------------------------------------------------------------------
# frame header (§9)
# ---------------------------------------------------------------------------

VP8_START_CODE = b"\x9d\x01\x2a"

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


def _clamp_qi(qi: int) -> int:
    return 0 if qi < 0 else (127 if qi > 127 else qi)


class _KeyframeHeader:
    """Parsed key-frame header state (first partition, §9.2-9.11)."""

    def __init__(self, data: bytes):
        from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
            vp8_tables as T,
        )

        if len(data) < 10:
            raise ValueError("vp8: truncated frame")
        tag = data[0] | (data[1] << 8) | (data[2] << 16)
        self.frame_type = tag & 1
        self.version = (tag >> 1) & 7
        self.show_frame = (tag >> 4) & 1
        first_part_size = tag >> 5
        if self.frame_type != 0:
            raise NotImplementedError(
                "vp8: inter frame requires reference buffers; route to "
                "decoder host (SCALING.md video routing policy)"
            )
        if data[3:6] != VP8_START_CODE:
            raise ValueError("vp8: bad start code")
        wtag = data[6] | (data[7] << 8)
        htag = data[8] | (data[9] << 8)
        self.width = wtag & 0x3FFF
        self.height = htag & 0x3FFF
        if self.width == 0 or self.height == 0:
            raise ValueError("vp8: zero frame dimension")
        body = data[10:]
        if first_part_size > len(body):
            raise ValueError("vp8: first partition overruns frame")
        self.first_part_size = first_part_size
        bd = _BoolDecoder(body[:first_part_size])
        self.color_space = bd.read_literal(1)
        self.clamping_type = bd.read_literal(1)
        # --- segmentation (§9.3)
        self.segmentation_enabled = bd.read(128)
        self.update_mb_seg_map = 0
        self.seg_tree_probs = [255, 255, 255]
        self.seg_abs_delta = 0
        self.seg_q = [0, 0, 0, 0]
        self.seg_lf = [0, 0, 0, 0]
        if self.segmentation_enabled:
            self.update_mb_seg_map = bd.read(128)
            update_data = bd.read(128)
            if update_data:
                self.seg_abs_delta = bd.read(128)
                self.seg_q = [bd.read_flagged_signed(7) for _ in range(4)]
                self.seg_lf = [bd.read_flagged_signed(6) for _ in range(4)]
            if self.update_mb_seg_map:
                self.seg_tree_probs = [
                    bd.read_literal(8) if bd.read(128) else 255
                    for _ in range(3)
                ]
        # --- loop filter (§9.4)
        self.filter_type = bd.read_literal(1)  # 0 normal, 1 simple
        self.filter_level = bd.read_literal(6)
        self.sharpness = bd.read_literal(3)
        self.lf_delta_enabled = bd.read(128)
        self.ref_lf_deltas = [0, 0, 0, 0]
        self.mode_lf_deltas = [0, 0, 0, 0]
        if self.lf_delta_enabled:
            if bd.read(128):  # mode_ref_lf_delta_update
                self.ref_lf_deltas = [
                    bd.read_signed_literal(6) if bd.read(128) else 0
                    for _ in range(4)
                ]
                self.mode_lf_deltas = [
                    bd.read_signed_literal(6) if bd.read(128) else 0
                    for _ in range(4)
                ]
        # --- token partitions (§9.5)
        self.n_partitions = 1 << bd.read_literal(2)
        # --- quantizers (§9.6)
        self.y_ac_qi = bd.read_literal(7)
        self.y1dc_delta = bd.read_flagged_signed(4)
        self.y2dc_delta = bd.read_flagged_signed(4)
        self.y2ac_delta = bd.read_flagged_signed(4)
        self.uvdc_delta = bd.read_flagged_signed(4)
        self.uvac_delta = bd.read_flagged_signed(4)
        # --- (§9.7) keyframes: refresh entropy probs flag
        self.refresh_entropy = bd.read(128)
        # --- coefficient probability updates (§13.4)
        probs = [
            [[list(ctx) for ctx in band] for band in btype]
            for btype in T.DEFAULT_COEFF_PROBS
        ]
        for i in range(4):
            for j in range(8):
                for k in range(3):
                    for m in range(11):
                        if bd.read(T.COEFF_UPDATE_PROBS[i][j][k][m]):
                            probs[i][j][k][m] = bd.read_literal(8)
        self.coeff_probs = probs
        # --- macroblock skip flag (§9.10)
        self.mb_no_coeff_skip = bd.read(128)
        self.prob_skip_false = (
            bd.read_literal(8) if self.mb_no_coeff_skip else 0
        )
        self.header_bd = bd

    def quant_factors(self, segment: int):
        """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) dequant
        factors (§9.6, §14.1)."""
        from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
            vp8_tables as T,
        )

        qi = self.y_ac_qi
        if self.segmentation_enabled:
            qi = (
                self.seg_q[segment]
                if self.seg_abs_delta
                else qi + self.seg_q[segment]
            )
        qi = _clamp_qi(qi)
        y1dc = T.DC_QLOOKUP[_clamp_qi(qi + self.y1dc_delta)]
        y1ac = T.AC_QLOOKUP[qi]
        y2dc = T.DC_QLOOKUP[_clamp_qi(qi + self.y2dc_delta)] * 2
        y2ac = T.AC_QLOOKUP[_clamp_qi(qi + self.y2ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = T.DC_QLOOKUP[_clamp_qi(qi + self.uvdc_delta)]
        if uvdc > 132:
            uvdc = 132
        uvac = T.AC_QLOOKUP[_clamp_qi(qi + self.uvac_delta)]
        return y1dc, y1ac, y2dc, y2ac, uvdc, uvac


# ---------------------------------------------------------------------------
# inverse transforms (§14.3-14.5) — exact integer arithmetic; Python's
# ``>>`` on negative ints is the arithmetic shift the spec's C assumes
# ---------------------------------------------------------------------------

_COS = 20091  # cospi8sqrt2 - 1, Q16
_SIN = 35468  # sinpi8sqrt2, Q16


def idct4x4(block):
    """§14.3 inverse DCT on a length-16 coefficient list (row-major)."""
    ip = list(block)
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 8]
        b1 = ip[i] - ip[i + 8]
        t1 = (ip[i + 4] * _SIN) >> 16
        t2 = ip[i + 12] + ((ip[i + 12] * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip[i + 4] + ((ip[i + 4] * _COS) >> 16)
        t2 = (ip[i + 12] * _SIN) >> 16
        d1 = t1 + t2
        op[i] = a1 + d1
        op[i + 12] = a1 - d1
        op[i + 4] = b1 + c1
        op[i + 8] = b1 - c1
    ip = op
    op = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = ip[r] + ip[r + 2]
        b1 = ip[r] - ip[r + 2]
        t1 = (ip[r + 1] * _SIN) >> 16
        t2 = ip[r + 3] + ((ip[r + 3] * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip[r + 1] + ((ip[r + 1] * _COS) >> 16)
        t2 = (ip[r + 3] * _SIN) >> 16
        d1 = t1 + t2
        op[r] = (a1 + d1 + 4) >> 3
        op[r + 3] = (a1 - d1 + 4) >> 3
        op[r + 1] = (b1 + c1 + 4) >> 3
        op[r + 2] = (b1 - c1 + 4) >> 3
    return op


def iwht4x4(block):
    """§14.4 inverse Walsh-Hadamard for the Y2 (second-order) block."""
    ip = list(block)
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 12]
        b1 = ip[i + 4] + ip[i + 8]
        c1 = ip[i + 4] - ip[i + 8]
        d1 = ip[i] - ip[i + 12]
        op[i] = a1 + b1
        op[i + 4] = c1 + d1
        op[i + 8] = a1 - b1
        op[i + 12] = d1 - c1
    ip = op
    op = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = ip[r] + ip[r + 3]
        b1 = ip[r + 1] + ip[r + 2]
        c1 = ip[r + 1] - ip[r + 2]
        d1 = ip[r] - ip[r + 3]
        op[r] = (a1 + b1 + 3) >> 3
        op[r + 1] = (c1 + d1 + 3) >> 3
        op[r + 2] = (a1 - b1 + 3) >> 3
        op[r + 3] = (d1 - c1 + 3) >> 3
    return op


# ---------------------------------------------------------------------------
# residual token decoding (§13)
# ---------------------------------------------------------------------------


def _decode_block_coeffs(bd, type_probs, ctx: int, first_coeff: int):
    """One 4x4 block's dequant-ready coefficients: returns
    ``(coeffs[16] in raster order, has_nonzero)``.  ``ctx`` is the
    above+left nonzero context (0-2); ``first_coeff`` is 1 for luma
    blocks whose DC lives in the Y2 block."""
    from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
        vp8_tables as T,
    )

    coeffs = [0] * 16
    i = first_coeff
    start = 0  # tree entry: EOB reachable
    nonzero = False
    while i < 16:
        probs = type_probs[T.COEF_BANDS[i]][ctx]
        tok = bd.read_tree(T.COEF_TREE, probs, start)
        if tok == T.EOB_TOKEN:
            break
        if tok == T.ZERO_TOKEN:
            i += 1
            ctx = 0
            start = 2  # after a zero, EOB cannot follow
            continue
        start = 0
        if tok <= T.FOUR_TOKEN:
            v = tok  # ONE..FOUR == 1..4
        else:
            extra = 0
            for p in T.CAT_PROBS[tok]:
                extra = (extra << 1) | bd.read(p)
            v = T.CAT_BASE[tok] + extra
        if bd.read(128):
            v = -v
        coeffs[T.ZIGZAG[i]] = v
        ctx = 2 if abs(v) > 1 else 1
        nonzero = True
        i += 1
    return coeffs, nonzero


# ---------------------------------------------------------------------------
# intra predictors (§12) — operate on a padded plane in place
# ---------------------------------------------------------------------------


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict_block_16_or_8(plane, py: int, px: int, n: int, mode: int,
                           have_above: bool, have_left: bool) -> None:
    """DC/V/H/TM prediction for an n x n block (n = 16 luma, 8 chroma)
    at padded coordinates (py, px).  The plane's borders already carry
    the spec's edge defaults (127 above / 129 left), so V/H/TM read
    them directly; DC follows §12.2's availability cases."""
    from national_caseload_data_ingest_spark.operators.vp8_tables import (  # noqa: PLC0415
        DC_PRED, H_PRED, TM_PRED, V_PRED,
    )

    above = plane[py - 1, px : px + n]
    left = plane[py : py + n, px - 1]
    tl = int(plane[py - 1, px - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + n) >> (
                5 if n == 16 else 4
            )
        elif have_above:
            dc = (int(above.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        else:
            dc = 128
        plane[py : py + n, px : px + n] = dc
    elif mode == V_PRED:
        plane[py : py + n, px : px + n] = above[None, :]
    elif mode == H_PRED:
        plane[py : py + n, px : px + n] = left[:, None]
    elif mode == TM_PRED:
        import numpy as np  # noqa: PLC0415

        vals = (
            left.astype(np.int32)[:, None]
            + above.astype(np.int32)[None, :]
            - tl
        )
        plane[py : py + n, px : px + n] = np.clip(vals, 0, 255).astype(
            plane.dtype
        )
    else:
        raise ValueError(f"vp8: bad 16x16/chroma mode {mode}")


def _predict_subblock(plane, py: int, px: int, mode: int, ar) -> None:
    """4x4 B_PRED submode prediction at padded (py, px).  ``ar`` is the
    4-pixel above-right array (the caller resolves VP8's above-right
    sourcing quirk).  Direct transliteration of §12.3."""
    from national_caseload_data_ingest_spark.operators.vp8_tables import (  # noqa: PLC0415
        B_DC_PRED, B_HD_PRED, B_HE_PRED, B_HU_PRED, B_LD_PRED,
        B_RD_PRED, B_TM_PRED, B_VE_PRED, B_VL_PRED, B_VR_PRED,
    )

    a = [int(v) for v in plane[py - 1, px : px + 4]]
    left = [int(plane[py + i, px - 1]) for i in range(4)]
    tl = int(plane[py - 1, px - 1])
    ar = [int(v) for v in ar]
    b = [[0] * 4 for _ in range(4)]
    if mode == B_DC_PRED:
        dc = (sum(a) + sum(left) + 4) >> 3
        for r in range(4):
            for c in range(4):
                b[r][c] = dc
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                b[r][c] = _clip255(left[r] + a[c] - tl)
    elif mode == B_VE_PRED:
        e = [tl] + a + [ar[0]]
        for c in range(4):
            v = (e[c] + 2 * e[c + 1] + e[c + 2] + 2) >> 2
            for r in range(4):
                b[r][c] = v
    elif mode == B_HE_PRED:
        e = [tl] + left + [left[3]]
        for r in range(4):
            v = (e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2
            for c in range(4):
                b[r][c] = v
    elif mode == B_LD_PRED:
        e = a + ar
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    b[r][c] = (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
                else:
                    b[r][c] = (e[6] + 3 * e[7] + 2) >> 2
    elif mode == B_RD_PRED:
        e = [left[3], left[2], left[1], left[0], tl, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3  # diagonal index into e
                b[r][c] = (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
    elif mode == B_VR_PRED:
        p = [left[3], left[2], left[1], left[0], tl, a[0], a[1], a[2], a[3]]
        b[3][0] = (p[1] + 2 * p[2] + p[3] + 2) >> 2
        b[2][0] = (p[2] + 2 * p[3] + p[4] + 2) >> 2
        b[3][1] = b[1][0] = (p[3] + 2 * p[4] + p[5] + 2) >> 2
        b[2][1] = b[0][0] = (p[4] + p[5] + 1) >> 1
        b[3][2] = b[1][1] = (p[4] + 2 * p[5] + p[6] + 2) >> 2
        b[2][2] = b[0][1] = (p[5] + p[6] + 1) >> 1
        b[3][3] = b[1][2] = (p[5] + 2 * p[6] + p[7] + 2) >> 2
        b[2][3] = b[0][2] = (p[6] + p[7] + 1) >> 1
        b[1][3] = (p[6] + 2 * p[7] + p[8] + 2) >> 2
        b[0][3] = (p[7] + p[8] + 1) >> 1
    elif mode == B_VL_PRED:
        p = a + ar
        b[0][0] = (p[0] + p[1] + 1) >> 1
        b[1][0] = (p[0] + 2 * p[1] + p[2] + 2) >> 2
        b[2][0] = b[0][1] = (p[1] + p[2] + 1) >> 1
        b[1][1] = b[3][0] = (p[1] + 2 * p[2] + p[3] + 2) >> 2
        b[2][1] = b[0][2] = (p[2] + p[3] + 1) >> 1
        b[3][1] = b[1][2] = (p[2] + 2 * p[3] + p[4] + 2) >> 2
        b[0][3] = b[2][2] = (p[3] + p[4] + 1) >> 1
        b[1][3] = b[3][2] = (p[3] + 2 * p[4] + p[5] + 2) >> 2
        b[2][3] = (p[4] + 2 * p[5] + p[6] + 2) >> 2
        b[3][3] = (p[5] + 2 * p[6] + p[7] + 2) >> 2
    elif mode == B_HD_PRED:
        p = [left[3], left[2], left[1], left[0], tl, a[0], a[1], a[2]]
        b[3][0] = (p[0] + p[1] + 1) >> 1
        b[3][1] = (p[0] + 2 * p[1] + p[2] + 2) >> 2
        b[2][0] = b[3][2] = (p[1] + p[2] + 1) >> 1
        b[2][1] = b[3][3] = (p[1] + 2 * p[2] + p[3] + 2) >> 2
        b[2][2] = b[1][0] = (p[2] + p[3] + 1) >> 1
        b[2][3] = b[1][1] = (p[2] + 2 * p[3] + p[4] + 2) >> 2
        b[1][2] = b[0][0] = (p[3] + p[4] + 1) >> 1
        b[1][3] = b[0][1] = (p[3] + 2 * p[4] + p[5] + 2) >> 2
        b[0][2] = (p[4] + 2 * p[5] + p[6] + 2) >> 2
        b[0][3] = (p[5] + 2 * p[6] + p[7] + 2) >> 2
    elif mode == B_HU_PRED:
        p = left
        b[0][0] = (p[0] + p[1] + 1) >> 1
        b[0][1] = (p[0] + 2 * p[1] + p[2] + 2) >> 2
        b[0][2] = b[1][0] = (p[1] + p[2] + 1) >> 1
        b[0][3] = b[1][1] = (p[1] + 2 * p[2] + p[3] + 2) >> 2
        b[1][2] = b[2][0] = (p[2] + p[3] + 1) >> 1
        b[1][3] = b[2][1] = (p[2] + 3 * p[3] + 2) >> 2
        b[2][2] = b[2][3] = b[3][0] = b[3][1] = b[3][2] = b[3][3] = p[3]
    else:
        raise ValueError(f"vp8: bad subblock mode {mode}")
    for r in range(4):
        for c in range(4):
            plane[py + r, px + c] = b[r][c]


# ---------------------------------------------------------------------------
# loop filter (§15)
# ---------------------------------------------------------------------------


def _c128(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _lf_limits(level: int, sharpness: int):
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)  # key frame
    mb_edge = ((level + 2) * 2) + interior
    sub_edge = (level * 2) + interior
    return interior, hev_t, mb_edge, sub_edge


def _common_adjust(use_outer: bool, px, i0: int, step: int) -> int:
    """§15.2 common adjustment on pixels p1,p0,q0,q1 located at
    ``i0-2*step .. i0+step`` in flat array ``px``; returns the F tap."""
    p1 = int(px[i0 - 2 * step]) - 128
    p0 = int(px[i0 - step]) - 128
    q0 = int(px[i0]) - 128
    q1 = int(px[i0 + step]) - 128
    a = _c128((_c128(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c128(a + 4) >> 3
    e = _c128(a + 3) >> 3
    px[i0] = _c128(q0 - f) + 128
    px[i0 - step] = _c128(p0 + e) + 128
    return f


def _filter_yes(px, i0: int, step: int, edge_limit: int,
                interior: int) -> bool:
    p = [int(px[i0 + (k - 4) * step]) for k in range(8)]  # p3..p0 q0..q3
    return (
        abs(p[3] - p[4]) * 2 + abs(p[2] - p[5]) // 2 <= edge_limit
        and abs(p[0] - p[1]) <= interior
        and abs(p[1] - p[2]) <= interior
        and abs(p[2] - p[3]) <= interior
        and abs(p[5] - p[4]) <= interior
        and abs(p[6] - p[5]) <= interior
        and abs(p[7] - p[6]) <= interior
    )


def _is_hev(px, i0: int, step: int, thresh: int) -> bool:
    return (
        abs(int(px[i0 - 2 * step]) - int(px[i0 - step])) > thresh
        or abs(int(px[i0 + step]) - int(px[i0])) > thresh
    )


def _subblock_filter(px, i0: int, step: int, edge: int, interior: int,
                     hev_t: int) -> None:
    if not _filter_yes(px, i0, step, edge, interior):
        return
    hev = _is_hev(px, i0, step, hev_t)
    f = _common_adjust(hev, px, i0, step)
    if not hev:
        a = (f + 1) >> 1
        px[i0 + step] = _c128((int(px[i0 + step]) - 128) - a) + 128
        px[i0 - 2 * step] = _c128((int(px[i0 - 2 * step]) - 128) + a) + 128


def _mb_filter(px, i0: int, step: int, edge: int, interior: int,
               hev_t: int) -> None:
    if not _filter_yes(px, i0, step, edge, interior):
        return
    if _is_hev(px, i0, step, hev_t):
        _common_adjust(True, px, i0, step)
        return
    p2 = int(px[i0 - 3 * step]) - 128
    p1 = int(px[i0 - 2 * step]) - 128
    p0 = int(px[i0 - step]) - 128
    q0 = int(px[i0]) - 128
    q1 = int(px[i0 + step]) - 128
    q2 = int(px[i0 + 2 * step]) - 128
    w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
    a = _c128((27 * w + 63) >> 7)
    px[i0] = _c128(q0 - a) + 128
    px[i0 - step] = _c128(p0 + a) + 128
    a = _c128((18 * w + 63) >> 7)
    px[i0 + step] = _c128(q1 - a) + 128
    px[i0 - 2 * step] = _c128(p1 + a) + 128
    a = _c128((9 * w + 63) >> 7)
    px[i0 + 2 * step] = _c128(q2 - a) + 128
    px[i0 - 3 * step] = _c128(p2 + a) + 128


def _simple_filter(px, i0: int, step: int, edge: int) -> None:
    p1 = int(px[i0 - 2 * step])
    p0 = int(px[i0 - step])
    q0 = int(px[i0])
    q1 = int(px[i0 + step])
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge:
        _common_adjust(True, px, i0, step)


def _loop_filter_frame(hdr, planes, mb_info, mb_w: int, mb_h: int) -> None:
    """§15: per-MB raster order — left MB edge, interior vertical
    edges, top MB edge, interior horizontal edges; Y + chroma for the
    normal filter, Y only for the simple filter.  Works on int32 flat
    views of the UNPADDED plane regions (in place)."""
    y, u, v = planes
    yw = y.shape[1]
    cw = u.shape[1]
    yf = y.reshape(-1)
    uf = u.reshape(-1)
    vf = v.reshape(-1)
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            level, inner = mb_info[mb_y][mb_x]
            if level == 0:
                continue
            interior, hev_t, mb_edge, sub_edge = _lf_limits(
                level, hdr.sharpness
            )
            simple = hdr.filter_type == 1
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            # --- vertical edges (filter across columns; step=1)
            if mb_x > 0:
                for r in range(16):
                    i = (y0 + r) * yw + x0
                    if simple:
                        _simple_filter(yf, i, 1, mb_edge)
                    else:
                        _mb_filter(yf, i, 1, mb_edge, interior, hev_t)
                if not simple:
                    for r in range(8):
                        i = (cy0 + r) * cw + cx0
                        _mb_filter(uf, i, 1, mb_edge, interior, hev_t)
                        _mb_filter(vf, i, 1, mb_edge, interior, hev_t)
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        i = (y0 + r) * yw + x0 + dx
                        if simple:
                            _simple_filter(yf, i, 1, sub_edge)
                        else:
                            _subblock_filter(yf, i, 1, sub_edge,
                                             interior, hev_t)
                if not simple:
                    for r in range(8):
                        i = (cy0 + r) * cw + cx0 + 4
                        _subblock_filter(uf, i, 1, sub_edge, interior, hev_t)
                        _subblock_filter(vf, i, 1, sub_edge, interior, hev_t)
            # --- horizontal edges (filter across rows; step=row width)
            if mb_y > 0:
                for c in range(16):
                    i = y0 * yw + x0 + c
                    if simple:
                        _simple_filter(yf, i, yw, mb_edge)
                    else:
                        _mb_filter(yf, i, yw, mb_edge, interior, hev_t)
                if not simple:
                    for c in range(8):
                        i = cy0 * cw + cx0 + c
                        _mb_filter(uf, i, cw, mb_edge, interior, hev_t)
                        _mb_filter(vf, i, cw, mb_edge, interior, hev_t)
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        i = (y0 + dy) * yw + x0 + c
                        if simple:
                            _simple_filter(yf, i, yw, sub_edge)
                        else:
                            _subblock_filter(yf, i, yw, sub_edge,
                                             interior, hev_t)
                if not simple:
                    for c in range(8):
                        i = (cy0 + 4) * cw + cx0 + c
                        _subblock_filter(uf, i, cw, sub_edge, interior, hev_t)
                        _subblock_filter(vf, i, cw, sub_edge, interior, hev_t)


# ---------------------------------------------------------------------------
# key-frame decode (the public entry points)
# ---------------------------------------------------------------------------


def vp8_decode_keyframe(data: bytes):
    """VP8 key frame → ``(width, height, (Y, U, V))`` uint8 planes —
    Y at full resolution, U/V at 4:2:0 — cropped to the frame size.

    Raises ``ValueError`` on structural corruption (bad start code,
    partition overruns, END-OF-PARTITION drift — the table-desync
    tripwire) and ``NotImplementedError`` on inter frames (routed to a
    host by the SCALING.md video policy)."""
    import numpy as np  # noqa: PLC0415

    from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
        vp8_tables as T,
    )

    hdr = _KeyframeHeader(data)
    mb_w = (hdr.width + 15) // 16
    mb_h = (hdr.height + 15) // 16
    body = data[10:]
    pos = hdr.first_part_size
    sizes = []
    for _ in range(hdr.n_partitions - 1):
        if pos + 3 > len(body):
            raise ValueError("vp8: partition size table overruns frame")
        sizes.append(int.from_bytes(body[pos : pos + 3], "little"))
        pos += 3
    parts = []
    for i in range(hdr.n_partitions):
        if i < hdr.n_partitions - 1:
            if pos + sizes[i] > len(body):
                raise ValueError("vp8: token partition overruns frame")
            parts.append(body[pos : pos + sizes[i]])
            pos += sizes[i]
        else:
            parts.append(body[pos:])
    part_bds = [_BoolDecoder(p) for p in parts]
    bd = hdr.header_bd

    W, H = mb_w * 16, mb_h * 16
    ypad = np.empty((H + 1, W + 5), dtype=np.int32)
    upad = np.empty((H // 2 + 1, W // 2 + 1), dtype=np.int32)
    vpad = np.empty((H // 2 + 1, W // 2 + 1), dtype=np.int32)
    for pad in (ypad, upad, vpad):
        pad[0, :] = 127   # above-frame row (and above-left corner)
        pad[1:, 0] = 129  # left-of-frame column

    # entropy contexts (nonzero flags), one per 4x4 block column/row
    above_y = [0] * (4 * mb_w)
    above_u = [0] * (2 * mb_w)
    above_v = [0] * (2 * mb_w)
    above_y2 = [0] * mb_w
    # B_PRED submode context rows (implied submode for 16x16 modes)
    implied = {T.DC_PRED: T.B_DC_PRED, T.V_PRED: T.B_VE_PRED,
               T.H_PRED: T.B_HE_PRED, T.TM_PRED: T.B_TM_PRED}
    above_sub = [[T.B_DC_PRED] * 4 for _ in range(mb_w)]

    quant_cache = {}
    mb_info = [[(0, False)] * mb_w for _ in range(mb_h)]

    for mb_y in range(mb_h):
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        left_sub = [T.B_DC_PRED] * 4
        tbd = part_bds[mb_y % hdr.n_partitions]
        for mb_x in range(mb_w):
            # ---- per-MB header info (first partition)
            segment = 0
            if hdr.update_mb_seg_map:
                segment = bd.read_tree(_SEGMENT_TREE, hdr.seg_tree_probs)
            skip = (
                bd.read(hdr.prob_skip_false)
                if hdr.mb_no_coeff_skip
                else 0
            )
            ymode = bd.read_tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB)
            if ymode == T.B_PRED:
                sub_modes = [[0] * 4 for _ in range(4)]
                for sr in range(4):
                    for sc in range(4):
                        a = (
                            above_sub[mb_x][sc]
                            if sr == 0
                            else sub_modes[sr - 1][sc]
                        )
                        lft = (
                            left_sub[sr] if sc == 0 else sub_modes[sr][sc - 1]
                        )
                        sub_modes[sr][sc] = bd.read_tree(
                            T.BMODE_TREE, T.KF_BMODE_PROB[a][lft]
                        )
            else:
                sub_modes = [[implied[ymode]] * 4 for _ in range(4)]
            uv_mode = bd.read_tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB)
            has_y2 = ymode != T.B_PRED

            if segment not in quant_cache:
                quant_cache[segment] = hdr.quant_factors(segment)
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quant_cache[segment]

            # ---- residual tokens (row's token partition)
            y_coeffs = [[0] * 16 for _ in range(16)]
            u_coeffs = [[0] * 16 for _ in range(4)]
            v_coeffs = [[0] * 16 for _ in range(4)]
            any_nonzero = False
            if skip:
                for sc in range(4):
                    above_y[4 * mb_x + sc] = 0
                    left_y[sc] = 0
                for sc in range(2):
                    above_u[2 * mb_x + sc] = left_u[sc] = 0
                    above_v[2 * mb_x + sc] = left_v[sc] = 0
                if has_y2:
                    above_y2[mb_x] = left_y2 = 0
            else:
                y2_out = None
                if has_y2:
                    ctx = above_y2[mb_x] + left_y2
                    coeffs, nz = _decode_block_coeffs(
                        tbd, hdr.coeff_probs[1], ctx, 0
                    )
                    above_y2[mb_x] = left_y2 = int(nz)
                    any_nonzero |= nz
                    dq = [
                        coeffs[i] * (y2dc if i == 0 else y2ac)
                        for i in range(16)
                    ]
                    y2_out = iwht4x4(dq)
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    ctx = above_y[4 * mb_x + sc] + left_y[sr]
                    coeffs, nz = _decode_block_coeffs(
                        tbd, hdr.coeff_probs[ytype], ctx, first
                    )
                    above_y[4 * mb_x + sc] = left_y[sr] = int(nz)
                    any_nonzero |= nz
                    dq = [
                        coeffs[i] * (y1dc if i == 0 else y1ac)
                        for i in range(16)
                    ]
                    if y2_out is not None:
                        dq[0] = y2_out[sb]
                    y_coeffs[sb] = dq
                for plane_coeffs, above_c, left_c in (
                    (u_coeffs, above_u, left_u),
                    (v_coeffs, above_v, left_v),
                ):
                    for sb in range(4):
                        sr, sc = sb >> 1, sb & 1
                        ctx = above_c[2 * mb_x + sc] + left_c[sr]
                        coeffs, nz = _decode_block_coeffs(
                            tbd, hdr.coeff_probs[2], ctx, 0
                        )
                        above_c[2 * mb_x + sc] = left_c[sr] = int(nz)
                        any_nonzero |= nz
                        plane_coeffs[sb] = [
                            coeffs[i] * (uvdc if i == 0 else uvac)
                            for i in range(16)
                        ]

            # ---- reconstruction
            py, px = 1 + mb_y * 16, 1 + mb_x * 16
            have_above, have_left = mb_y > 0, mb_x > 0
            if ymode != T.B_PRED:
                _predict_block_16_or_8(
                    ypad, py, px, 16, ymode, have_above, have_left
                )
                for sb in range(16):
                    dq = y_coeffs[sb]
                    if any(dq):
                        out = idct4x4(dq)
                        _add_residual(ypad, py + (sb >> 2) * 4,
                                      px + (sb & 3) * 4, out)
            else:
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    spy, spx = py + sr * 4, px + sc * 4
                    if sc == 3:
                        ar = ypad[py - 1, px + 16 : px + 20]
                    else:
                        ar = ypad[spy - 1, spx + 4 : spx + 8]
                    _predict_subblock(ypad, spy, spx, sub_modes[sr][sc], ar)
                    dq = y_coeffs[sb]
                    if any(dq):
                        _add_residual(ypad, spy, spx, idct4x4(dq))
            cpy, cpx = 1 + mb_y * 8, 1 + mb_x * 8
            for pad, plane_coeffs in ((upad, u_coeffs), (vpad, v_coeffs)):
                _predict_block_16_or_8(
                    pad, cpy, cpx, 8, uv_mode, have_above, have_left
                )
                for sb in range(4):
                    dq = plane_coeffs[sb]
                    if any(dq):
                        _add_residual(pad, cpy + (sb >> 1) * 4,
                                      cpx + (sb & 1) * 4, idct4x4(dq))

            # ---- loop-filter bookkeeping
            level = hdr.filter_level
            if hdr.segmentation_enabled:
                level = (
                    hdr.seg_lf[segment]
                    if hdr.seg_abs_delta
                    else level + hdr.seg_lf[segment]
                )
            if hdr.lf_delta_enabled:
                level += hdr.ref_lf_deltas[0]  # intra frame
                if ymode == T.B_PRED:
                    level += hdr.mode_lf_deltas[0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            inner = bool(any_nonzero) or ymode == T.B_PRED
            mb_info[mb_y][mb_x] = (level, inner)

            above_sub[mb_x] = list(sub_modes[3])
            left_sub = [sub_modes[r][3] for r in range(4)]
        # replicate the MB row's rightmost column into the above-right pad
        r0, r1 = 1 + mb_y * 16, 1 + mb_y * 16 + 16
        ypad[r0:r1, W + 1 : W + 5] = ypad[r0:r1, W : W + 1]

    # ---- END-OF-PARTITION drift checks: a desynchronized bool decoder
    # (wrong table entry, corrupt stream) almost surely lands outside
    # the final byte window of its partition
    if bd.byte_pos < len(bd.data) - 3 or bd.byte_pos > len(bd.data) + 3:
        raise ValueError(
            "vp8: first-partition position drift "
            f"({bd.byte_pos}/{len(bd.data)}) — stream/table desync"
        )
    for i, tbd in enumerate(part_bds):
        if tbd.byte_pos < len(tbd.data) - 3 or tbd.byte_pos > len(
            tbd.data
        ) + 3:
            raise ValueError(
                f"vp8: token partition {i} position drift "
                f"({tbd.byte_pos}/{len(tbd.data)}) — stream/table desync"
            )

    if hdr.filter_level > 0 or hdr.segmentation_enabled or (
        hdr.lf_delta_enabled
    ):
        y = np.ascontiguousarray(ypad[1:, 1 : W + 1])
        u = np.ascontiguousarray(upad[1:, 1 : W // 2 + 1])
        v = np.ascontiguousarray(vpad[1:, 1 : W // 2 + 1])
        _loop_filter_frame(hdr, (y, u, v), mb_info, mb_w, mb_h)
    else:
        y = ypad[1:, 1 : W + 1]
        u = upad[1:, 1 : W // 2 + 1]
        v = vpad[1:, 1 : W // 2 + 1]

    w, h = hdr.width, hdr.height
    return (
        w,
        h,
        (
            y[:h, :w].astype(np.uint8),
            u[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8),
            v[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8),
        ),
    )


def _add_residual(plane, py: int, px: int, out) -> None:
    for r in range(4):
        base = r * 4
        row = plane[py + r]
        for c in range(4):
            v = int(row[px + c]) + out[base + c]
            row[px + c] = 0 if v < 0 else (255 if v > 255 else v)


def vp8_decode_rgb(data: bytes):
    """VP8 key frame → ``(width, height, rgb uint8 (h, w, 3))`` via the
    engine's deterministic integer BT.601 studio-range conversion with
    point (nearest) chroma upsampling.  The YUV planes are the
    spec-exact quantity; this conversion is a documented display
    choice, chosen for integer determinism rather than libwebp's fancy
    upsampler parity."""
    import numpy as np  # noqa: PLC0415

    w, h, (y, u, v) = vp8_decode_keyframe(data)
    c = y.astype(np.int32) - 16
    d = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    e = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return w, h, np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# key-frame stream builder (fixture encoder)
# ---------------------------------------------------------------------------


def _token_for(v: int):
    """Map a quantized magnitude to (token, extra_bits_value)."""
    from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
        vp8_tables as T,
    )

    a = abs(v)
    if a == 0:
        return T.ZERO_TOKEN, 0
    if a <= 4:
        return a, 0  # ONE..FOUR tokens equal their value
    for tok in (T.CAT1_TOKEN, T.CAT2_TOKEN, T.CAT3_TOKEN,
                T.CAT4_TOKEN, T.CAT5_TOKEN, T.CAT6_TOKEN):
        base = T.CAT_BASE[tok]
        nbits = len(T.CAT_PROBS[tok])
        if a < base + (1 << nbits):
            return tok, a - base
    raise ValueError(f"vp8 encode: coefficient magnitude {a} out of range")


def _encode_block_coeffs(be, type_probs, ctx: int, first_coeff: int,
                         raster) -> bool:
    """Mirror of :func:`_decode_block_coeffs`: emit tokens for the
    block's RASTER-order quantized coefficients; returns has_nonzero."""
    from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
        vp8_tables as T,
    )

    zz = [int(raster[T.ZIGZAG[i]]) for i in range(16)]
    last = -1
    for i in range(first_coeff, 16):
        if zz[i]:
            last = i
    start = 0
    nonzero = False
    for i in range(first_coeff, last + 1):
        probs = type_probs[T.COEF_BANDS[i]][ctx]
        v = zz[i]
        tok, extra = _token_for(v)
        be.put_tree(T.COEF_TREE, probs, tok, start)
        if tok == T.ZERO_TOKEN:
            ctx = 0
            start = 2
            continue
        start = 0
        if tok > T.FOUR_TOKEN:
            cat_probs = T.CAT_PROBS[tok]
            for bidx, p in enumerate(cat_probs):
                be.put((extra >> (len(cat_probs) - 1 - bidx)) & 1, p)
        be.put(1 if v < 0 else 0, 128)
        ctx = 2 if abs(v) > 1 else 1
        nonzero = True
    if last < 15:
        probs = type_probs[T.COEF_BANDS[max(last + 1, first_coeff)]][ctx]
        be.put_tree(T.COEF_TREE, probs, T.EOB_TOKEN, 0)
    return nonzero


def vp8_build_keyframe(
    width: int,
    height: int,
    mbs,
    y_ac_qi: int = 8,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
    n_partitions: int = 1,
    mb_no_coeff_skip: bool = True,
    segmentation=None,
    lf_deltas=None,
) -> bytes:
    """Construct a conformant VP8 key-frame stream from explicit per-MB
    choices — the fixture generator (no rate-distortion search: tests
    choose the quantized coefficients, an independent reference
    computes the expected reconstruction, and the decoder must match).

    ``mbs`` is a raster list of dicts, one per macroblock:
    ``ymode`` (DC/V/H/TM_PRED or B_PRED), ``sub_modes`` (4x4 list,
    required iff B_PRED), ``uv_mode``, ``y2`` (16 quantized coeffs or
    None), ``y`` (16 blocks x 16 raster coeffs), ``u``/``v`` (4 blocks
    each), and — when segmentation is on — ``segment`` (0-3).  Omitted
    coefficient arrays mean all-zero.

    ``segmentation``: None, or a dict with ``q_deltas`` (4 ints),
    ``lf_deltas`` (4 ints), and optional ``abs_delta`` (bool) — enables
    the §9.3 segment feature data AND the per-MB segment-id map (tree
    probs fixed at 128).  ``lf_deltas``: None, or a dict with ``ref``
    (4 ints) and ``mode`` (4 ints) — the §9.4 loop-filter adjustments
    (index 0 = intra / B_PRED on key frames)."""
    from national_caseload_data_ingest_spark.operators import (  # noqa: PLC0415
        vp8_tables as T,
    )

    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    if len(mbs) != mb_w * mb_h:
        raise ValueError("vp8 encode: wrong macroblock count")

    implied = {T.DC_PRED: T.B_DC_PRED, T.V_PRED: T.B_VE_PRED,
               T.H_PRED: T.B_HE_PRED, T.TM_PRED: T.B_TM_PRED}

    def mb_get(m, key, nblocks):
        arr = m.get(key)
        if arr is None:
            return [[0] * 16 for _ in range(nblocks)]
        return arr

    # ---- first partition: header + per-MB modes
    be = _BoolEncoder()
    be.put_literal(0, 1)  # color space
    be.put_literal(0, 1)  # clamping
    if segmentation is not None:
        be.put(1, 128)  # segmentation enabled
        be.put(1, 128)  # update mb segmentation map
        be.put(1, 128)  # update segment feature data
        be.put(1 if segmentation.get("abs_delta") else 0, 128)
        for v in segmentation.get("q_deltas", [0, 0, 0, 0]):
            be.put_flagged_signed(v, 7)
        for v in segmentation.get("lf_deltas", [0, 0, 0, 0]):
            be.put_flagged_signed(v, 6)
        for _ in range(3):  # segment tree probs: explicit 128s
            be.put(1, 128)
            be.put_literal(128, 8)
    else:
        be.put(0, 128)  # segmentation disabled
    be.put_literal(filter_type & 1, 1)
    be.put_literal(filter_level, 6)
    be.put_literal(sharpness, 3)
    if lf_deltas is not None:
        be.put(1, 128)  # lf delta enabled
        be.put(1, 128)  # update
        for v in lf_deltas.get("ref", [0, 0, 0, 0]):
            be.put_flagged_signed(v, 6)
        for v in lf_deltas.get("mode", [0, 0, 0, 0]):
            be.put_flagged_signed(v, 6)
    else:
        be.put(0, 128)  # lf deltas disabled
    be.put_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_partitions], 2)
    be.put_literal(y_ac_qi, 7)
    for _ in range(5):
        be.put(0, 128)  # no quantizer deltas
    be.put(1, 128)  # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    be.put(0, T.COEFF_UPDATE_PROBS[i][j][k][m])
    skip_prob = 128
    if mb_no_coeff_skip:
        be.put(1, 128)
        be.put_literal(skip_prob, 8)
    else:
        be.put(0, 128)

    # token partitions, one encoder per partition
    tbes = [_BoolEncoder() for _ in range(n_partitions)]

    above_y = [0] * (4 * mb_w)
    above_u = [0] * (2 * mb_w)
    above_v = [0] * (2 * mb_w)
    above_y2 = [0] * mb_w
    above_sub = [[T.B_DC_PRED] * 4 for _ in range(mb_w)]

    for mb_y in range(mb_h):
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        left_sub = [T.B_DC_PRED] * 4
        tbe = tbes[mb_y % n_partitions]
        for mb_x in range(mb_w):
            m = mbs[mb_y * mb_w + mb_x]
            ymode = m["ymode"]
            has_y2 = ymode != T.B_PRED
            y_blocks = mb_get(m, "y", 16)
            u_blocks = mb_get(m, "u", 4)
            v_blocks = mb_get(m, "v", 4)
            y2 = m.get("y2") or [0] * 16
            # a block is "empty" ignoring the DC that rides in Y2
            def _yb_empty(b):
                return not any(b[i] != 0 for i in range(16)
                               if not (has_y2 and i == 0))
            all_zero = (
                all(_yb_empty(b) for b in y_blocks)
                and not any(y2)
                and not any(any(b) for b in u_blocks + v_blocks)
            )
            skip = mb_no_coeff_skip and all_zero
            if segmentation is not None:
                be.put_tree(_SEGMENT_TREE, (128, 128, 128),
                            m.get("segment", 0))
            if mb_no_coeff_skip:
                be.put(1 if skip else 0, skip_prob)
            be.put_tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB, ymode)
            if ymode == T.B_PRED:
                sub_modes = m["sub_modes"]
                for sr in range(4):
                    for sc in range(4):
                        a = (
                            above_sub[mb_x][sc]
                            if sr == 0
                            else sub_modes[sr - 1][sc]
                        )
                        lft = (
                            left_sub[sr] if sc == 0 else sub_modes[sr][sc - 1]
                        )
                        be.put_tree(
                            T.BMODE_TREE,
                            T.KF_BMODE_PROB[a][lft],
                            sub_modes[sr][sc],
                        )
            else:
                sub_modes = [[implied[ymode]] * 4 for _ in range(4)]
            be.put_tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB, m["uv_mode"])

            if skip:
                for sc in range(4):
                    above_y[4 * mb_x + sc] = 0
                    left_y[sc] = 0
                for sc in range(2):
                    above_u[2 * mb_x + sc] = left_u[sc] = 0
                    above_v[2 * mb_x + sc] = left_v[sc] = 0
                if has_y2:
                    above_y2[mb_x] = left_y2 = 0
            else:
                from national_caseload_data_ingest_spark.operators.vp8_tables import (  # noqa: PLC0415
                    DEFAULT_COEFF_PROBS as P,
                )

                if has_y2:
                    ctx = above_y2[mb_x] + left_y2
                    nz = _encode_block_coeffs(tbe, P[1], ctx, 0, y2)
                    above_y2[mb_x] = left_y2 = int(nz)
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    ctx = above_y[4 * mb_x + sc] + left_y[sr]
                    nz = _encode_block_coeffs(
                        tbe, P[ytype], ctx, first, y_blocks[sb]
                    )
                    above_y[4 * mb_x + sc] = left_y[sr] = int(nz)
                for blocks, above_c, left_c in (
                    (u_blocks, above_u, left_u),
                    (v_blocks, above_v, left_v),
                ):
                    for sb in range(4):
                        sr, sc = sb >> 1, sb & 1
                        ctx = above_c[2 * mb_x + sc] + left_c[sr]
                        nz = _encode_block_coeffs(
                            tbe, P[2], ctx, 0, blocks[sb]
                        )
                        above_c[2 * mb_x + sc] = left_c[sr] = int(nz)

            above_sub[mb_x] = list(sub_modes[3])
            left_sub = [sub_modes[r][3] for r in range(4)]

    first_part = be.bytes()
    parts = [t.bytes() for t in tbes]
    tag = (len(first_part) << 5) | (1 << 4) | 0  # keyframe, show, v0
    out = bytearray()
    out += bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    out += VP8_START_CODE
    out += bytes([width & 0xFF, (width >> 8) & 0x3F])
    out += bytes([height & 0xFF, (height >> 8) & 0x3F])
    out += first_part
    for p in parts[:-1]:
        out += len(p).to_bytes(3, "little")
    for p in parts:
        out += p
    return bytes(out)
