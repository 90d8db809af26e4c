"""VP8 decode-side conformance tests derived from RFC 6386's published
normative tables and reference pseudocode (VERDICT r10 ask #3).

The decoder's other tests validate against the repo's own encoder plus
independent per-primitive references; this file adds a THIRD transcription
of the normative material, written directly from the RFC text into this
file, on exactly the paths an encoder/decoder pair could misread
symmetrically:

* the boolean arithmetic coder — an in-test transliteration of the RFC's
  carry-propagating byte-at-a-time reference encoder (§II pseudocode; a
  genuinely different formulation from the module's big-integer encoder)
  must produce streams the module decoder reads exactly;
* the coefficient-token tree, extra-bit categories, zigzag order, and
  band mapping (§13) — literal in-test copies, plus token streams encoded
  through the in-test encoder and decoded by ``_decode_block_coeffs``;
* the per-segment quantizer index mapping (§9.6/§14.1) — in-test lookup
  tables and formula recompute against ``quant_factors``, clamp edges
  included;
* predictor clamp saturation (§12.2/§12.3 TM modes) at both ends.
"""

from __future__ import annotations

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators import vp8_tables as T
from national_caseload_data_ingest_spark.operators.vp8 import (
    _BoolDecoder,
    _decode_block_coeffs,
    _KeyframeHeader,
    _predict_block_16_or_8,
    _predict_subblock,
)

# ---------------------------------------------------------------------------
# RFC 6386 literals, transcribed HERE from the spec text (not imported)
# ---------------------------------------------------------------------------

RFC_COEFF_TREE = (
    -11, 2,          # EOB
    -0, 4,           # DCT_0
    -1, 6,           # DCT_1
    8, 12,
    -2, 10,          # DCT_2
    -3, -4,          # DCT_3, DCT_4
    14, 16,
    -5, -6,          # cat1, cat2
    18, 20,
    -7, -8,          # cat3, cat4
    -9, -10,         # cat5, cat6
)

RFC_CAT_BASE = {5: 5, 6: 7, 7: 11, 8: 19, 9: 35, 10: 67}

RFC_CAT_PROBS = {
    5: (159,),
    6: (165, 145),
    7: (173, 148, 140),
    8: (176, 155, 140, 135),
    9: (180, 157, 141, 134, 130),
    10: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}

RFC_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

RFC_COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

RFC_DC_Q = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)

RFC_AC_Q = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)


def test_normative_tables_match_independent_transcription():
    """Two independent transcriptions of the RFC tables agreeing is the
    strongest in-sandbox defense against a mis-copied constant."""
    # token ids: module's enum must place EOB at 11 and cats at 5..10
    assert T.EOB_TOKEN == 11 and T.CAT1_TOKEN == 5 and T.CAT6_TOKEN == 10
    assert tuple(T.COEF_TREE) == RFC_COEFF_TREE
    assert {k: v for k, v in T.CAT_BASE.items()} == RFC_CAT_BASE
    assert {k: tuple(v) for k, v in T.CAT_PROBS.items()} == RFC_CAT_PROBS
    assert tuple(T.ZIGZAG) == RFC_ZIGZAG
    assert tuple(T.COEF_BANDS) == RFC_COEF_BANDS
    assert tuple(T.DC_QLOOKUP) == RFC_DC_Q
    assert tuple(T.AC_QLOOKUP) == RFC_AC_Q


# ---------------------------------------------------------------------------
# RFC reference bool encoder (carry-propagating byte-at-a-time, §II) —
# deliberately a DIFFERENT formulation from the module's big-int encoder
# ---------------------------------------------------------------------------


class RfcBoolEncoder:
    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def _shift_once(self):
        if self.bottom & (1 << 31):
            self._carry()
        self.bottom = (self.bottom << 1) & 0xFFFFFFFF
        self.bit_count -= 1
        if self.bit_count == 0:
            self.out.append((self.bottom >> 24) & 0xFF)
            self.bottom &= (1 << 24) - 1
            self.bit_count = 8

    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self._shift_once()

    def flush(self) -> bytes:
        for _ in range(32):
            self._shift_once()
        return bytes(self.out)


def test_rfc_reference_encoder_streams_decode_exactly():
    """Random bit/prob sequences through the RFC's own encoder
    pseudocode must decode bit-for-bit with the module decoder —
    including the edge probabilities 1 and 254 that stress renorm and
    carry propagation."""
    rng = np.random.default_rng(11)
    for trial in range(200):
        n = int(rng.integers(1, 200))
        bits = rng.integers(0, 2, n).tolist()
        probs = rng.integers(1, 255, n).tolist()
        if trial % 3 == 0:  # force carry-heavy streams
            probs = [254 if b else 1 for b in bits]
        enc = RfcBoolEncoder()
        for b, p in zip(bits, probs):
            enc.put(int(b), int(p))
        bd = _BoolDecoder(enc.flush())
        got = [bd.read(int(p)) for p in probs]
        assert got == [int(b) for b in bits], trial


# ---------------------------------------------------------------------------
# coefficient-token conformance through the RFC encoder
# ---------------------------------------------------------------------------


def _tree_path(tree, symbol, start=0):
    """Bit path to ``-symbol`` in ``tree`` — recomputed here from the
    in-test tree literal."""
    def reach(i):
        if i <= 0:
            return {-i}
        return reach(tree[i]) | reach(tree[i + 1])

    path = []
    i = start
    while True:
        bit = 1 if symbol in reach(tree[i + 1]) else 0
        path.append((i >> 1, bit))  # (prob index, bit)
        i = tree[i + bit]
        if i <= 0:
            return path


def _probs_for(band, ctx):
    """Distinct per-(band, ctx) node probabilities so a wrong band or
    context lookup in the decoder derails the stream immediately."""
    return [((37 + 13 * band + 51 * ctx + 7 * node) % 253) + 1
            for node in range(11)]


def _encode_tokens(tokens, first_coeff=0):
    """Encode (token, extra_bits, sign) triples per §13's state machine,
    using only this file's literals: band from position, ctx from the
    previous value, EOB branch skipped after a zero."""
    enc = RfcBoolEncoder()
    type_probs = [[_probs_for(b, c) for c in range(3)] for b in range(8)]
    i = first_coeff
    ctx = 0
    start = 0
    for tok, extra, sign in tokens:
        probs = type_probs[RFC_COEF_BANDS[i]][ctx]
        for prob_idx, bit in _tree_path(RFC_COEFF_TREE, tok, start):
            enc.put(bit, probs[prob_idx])
        if tok == 11:  # EOB
            break
        if tok == 0:
            i += 1
            ctx = 0
            start = 2
            continue
        start = 0
        if tok >= 5:  # category token: extra bits MSB-first
            cat_probs = RFC_CAT_PROBS[tok]
            for k in range(len(cat_probs) - 1, -1, -1):
                enc.put((extra >> k) & 1, cat_probs[len(cat_probs) - 1 - k])
            v = RFC_CAT_BASE[tok] + extra
        else:
            v = tok
        enc.put(sign, 128)
        ctx = 2 if v > 1 else 1
        i += 1
    return enc.flush(), type_probs


@pytest.mark.parametrize(
    "tok,extra,want",
    [
        (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 0, 4),
        (5, 0, 5), (5, 1, 6),            # cat1: base 5, 1 extra bit
        (6, 0, 7), (6, 3, 10),           # cat2: base 7, 2 bits
        (7, 0, 11), (7, 7, 18),          # cat3
        (8, 0, 19), (8, 15, 34),         # cat4
        (9, 0, 35), (9, 31, 66),         # cat5
        (10, 0, 67), (10, 2047, 2114),   # cat6: base 67, 11 bits
    ],
)
def test_token_category_reconstruction(tok, extra, want):
    """Every token's value = RFC base + MSB-first extra bits, both
    signs, decoded by the module from an RFC-encoder stream."""
    for sign in (0, 1):
        data, type_probs = _encode_tokens([(tok, extra, sign), (11, 0, 0)])
        bd = _BoolDecoder(data)
        coeffs, nonzero = _decode_block_coeffs(bd, type_probs, 0, 0)
        assert nonzero
        assert coeffs[RFC_ZIGZAG[0]] == (-want if sign else want)
        assert sum(1 for c in coeffs if c) == 1


def test_zigzag_placement_and_context_transitions():
    """A multi-token block: values land at the RFC zigzag positions and
    the decoder's (band, ctx) walk matches the in-test state machine —
    any divergence in ctx (0 after zero, 1 after ±1, 2 after >1) or in
    the band mapping desynchronizes the probs and corrupts the rest."""
    toks = [
        (2, 0, 0),    # +2 at zz[0]=0   -> ctx 2
        (1, 0, 1),    # -1 at zz[1]=1   -> ctx 1
        (0, 0, 0),    # zero at zz[2]   -> ctx 0, EOB-skip armed
        (5, 1, 0),    # +6 at zz[3]=8   (cat1, extra 1)
        (0, 0, 0),    # zero
        (0, 0, 0),    # zero
        (4, 0, 1),    # -4 at zz[6]=3
        (11, 0, 0),   # EOB
    ]
    data, type_probs = _encode_tokens(toks)
    bd = _BoolDecoder(data)
    coeffs, nonzero = _decode_block_coeffs(bd, type_probs, 0, 0)
    want = [0] * 16
    want[RFC_ZIGZAG[0]] = 2
    want[RFC_ZIGZAG[1]] = -1
    want[RFC_ZIGZAG[3]] = 6
    want[RFC_ZIGZAG[6]] = -4
    assert coeffs == want and nonzero


def test_eob_skip_after_zero_is_mandatory():
    """After a zero token the EOB branch is UNREACHABLE (§13.3): the
    encoder emits the next token from tree index 2, so a decoder that
    restarts at the root reads one stray bit and desynchronizes."""
    toks = [(0, 0, 0), (1, 0, 0), (11, 0, 0)]
    data, type_probs = _encode_tokens(toks)
    coeffs, _ = _decode_block_coeffs(_BoolDecoder(data), type_probs, 0, 0)
    want = [0] * 16
    want[RFC_ZIGZAG[1]] = 1
    assert coeffs == want


def test_first_coeff_band_offset_for_y2_blocks():
    """Luma blocks under a Y2 block start at coefficient 1 (§13.5):
    their first token is coded with band[1], not band[0]."""
    toks = [(3, 0, 0), (11, 0, 0)]
    data, type_probs = _encode_tokens(toks, first_coeff=1)
    coeffs, _ = _decode_block_coeffs(_BoolDecoder(data), type_probs, 0, 1)
    want = [0] * 16
    want[RFC_ZIGZAG[1]] = 3
    assert coeffs == want


def test_initial_context_selects_probability_set():
    """The above+left nonzero context (0/1/2) picks the first token's
    probability set; encoding under ctx=2 and decoding under the same
    ctx must agree (and the streams for different ctx differ)."""
    enc_streams = {}
    for ctx in (0, 1, 2):
        enc = RfcBoolEncoder()
        type_probs = [[_probs_for(b, c) for c in range(3)]
                      for b in range(8)]
        probs = type_probs[RFC_COEF_BANDS[0]][ctx]
        for prob_idx, bit in _tree_path(RFC_COEFF_TREE, 2):
            enc.put(bit, probs[prob_idx])
        enc.put(0, 128)  # sign
        probs = type_probs[RFC_COEF_BANDS[1]][2]  # after 2 -> ctx 2
        for prob_idx, bit in _tree_path(RFC_COEFF_TREE, 11):
            enc.put(bit, probs[prob_idx])
        data = enc.flush()
        enc_streams[ctx] = data
        coeffs, _ = _decode_block_coeffs(
            _BoolDecoder(data), type_probs, ctx, 0
        )
        assert coeffs[0] == 2, ctx
    assert len(set(enc_streams.values())) == 3


# ---------------------------------------------------------------------------
# per-segment quantizer index mapping (§9.6 / §14.1)
# ---------------------------------------------------------------------------


def _rfc_quant(qi, deltas, seg_enabled, abs_delta, seg_q, segment):
    """In-test recompute of the RFC's dequant-factor derivation."""
    def clamp(x):
        return 0 if x < 0 else (127 if x > 127 else x)

    q = qi
    if seg_enabled:
        q = seg_q[segment] if abs_delta else q + seg_q[segment]
    q = clamp(q)
    y1dc = RFC_DC_Q[clamp(q + deltas["y1dc"])]
    y1ac = RFC_AC_Q[q]
    y2dc = RFC_DC_Q[clamp(q + deltas["y2dc"])] * 2
    y2ac = RFC_AC_Q[clamp(q + deltas["y2ac"])] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = RFC_DC_Q[clamp(q + deltas["uvdc"])]
    if uvdc > 132:
        uvdc = 132
    uvac = RFC_AC_Q[clamp(q + deltas["uvac"])]
    return y1dc, y1ac, y2dc, y2ac, uvdc, uvac


def _header_stub(qi, deltas, seg_enabled, abs_delta, seg_q):
    h = _KeyframeHeader.__new__(_KeyframeHeader)
    h.y_ac_qi = qi
    h.y1dc_delta = deltas["y1dc"]
    h.y2dc_delta = deltas["y2dc"]
    h.y2ac_delta = deltas["y2ac"]
    h.uvdc_delta = deltas["uvdc"]
    h.uvac_delta = deltas["uvac"]
    h.segmentation_enabled = seg_enabled
    h.seg_abs_delta = abs_delta
    h.seg_q = seg_q
    return h


def test_quant_factor_mapping_matches_rfc_formulas():
    """Full sweep over clamp edges, segment absolute/delta modes, and
    the three special cases (y2dc doubling, y2ac 155/100 with floor 8,
    uvdc cap 132)."""
    delta_grid = (-64, -16, -1, 0, 1, 15)
    for qi in (0, 1, 10, 63, 126, 127):
        for d in delta_grid:
            deltas = {"y1dc": d, "y2dc": -d, "y2ac": d,
                      "uvdc": d, "uvac": -d}
            for seg_enabled, abs_delta, seg_q, segment in (
                (False, False, [0, 0, 0, 0], 0),
                (True, True, [0, 40, 90, 127], 3),
                (True, True, [0, 40, 90, 127], 0),
                (True, False, [-30, -1, 1, 30], 0),
                (True, False, [-200, 0, 0, 200], 0),  # clamp via segment
                (True, False, [-200, 0, 0, 200], 3),
            ):
                h = _header_stub(qi, deltas, seg_enabled, abs_delta, seg_q)
                assert h.quant_factors(segment) == _rfc_quant(
                    qi, deltas, seg_enabled, abs_delta, seg_q, segment
                ), (qi, d, seg_enabled, abs_delta, seg_q, segment)


def test_quant_special_cases_pinned():
    """The three asymmetric special cases, hit explicitly."""
    zero = {"y1dc": 0, "y2dc": 0, "y2ac": 0, "uvdc": 0, "uvac": 0}
    # y2ac floor: qi=0 -> ac 4 -> 4*155//100 = 6 -> floored to 8
    h = _header_stub(0, zero, False, False, [0] * 4)
    assert h.quant_factors(0)[3] == 8
    # y2dc doubling: qi=127 -> dc 157 -> 314 (NOT capped like uvdc)
    assert h.quant_factors(0)[2] == RFC_DC_Q[0] * 2
    h127 = _header_stub(127, zero, False, False, [0] * 4)
    assert h127.quant_factors(0)[2] == 157 * 2
    # uvdc cap: qi=127 -> dc 157 -> capped 132
    assert h127.quant_factors(0)[4] == 132


# ---------------------------------------------------------------------------
# predictor clamp saturation (§12.2 TM_PRED / §12.3 B_TM_PRED)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [16, 8])
def test_tm_pred_clamps_both_ends(n):
    plane = np.zeros((n + 2, n + 2), dtype=np.uint8)
    # above row 255, left col 255, top-left 0 -> 255+255-0 saturates high
    plane[0, 1:] = 255
    plane[1:, 0] = 255
    plane[0, 0] = 0
    _predict_block_16_or_8(plane, 1, 1, n, T.TM_PRED, True, True)
    assert (plane[1 : 1 + n, 1 : 1 + n] == 255).all()
    # above 0, left 0, top-left 255 -> 0+0-255 saturates low
    plane = np.full((n + 2, n + 2), 0, dtype=np.uint8)
    plane[0, 0] = 255
    _predict_block_16_or_8(plane, 1, 1, n, T.TM_PRED, True, True)
    assert (plane[1 : 1 + n, 1 : 1 + n] == 0).all()


def test_b_tm_pred_clamps_both_ends():
    plane = np.zeros((6, 10), dtype=np.uint8)
    plane[0, 1:] = 255
    plane[1:, 0] = 255
    plane[0, 0] = 0
    _predict_subblock(plane, 1, 1, T.B_TM_PRED, plane[0, 5:9])
    assert (plane[1:5, 1:5] == 255).all()
    plane = np.zeros((6, 10), dtype=np.uint8)
    plane[0, 0] = 255
    _predict_subblock(plane, 1, 1, T.B_TM_PRED, plane[0, 5:9])
    assert (plane[1:5, 1:5] == 0).all()
