"""RFC 8878 worked-example conformance for zstd DICTIONARY frames
(VERDICT r13 ask #5).

The existing dictionary tests (test_zstdnative.py) hand-assemble frames
but pick their FSE initial states by querying the MODULE's own
``_fse_build_dtable`` — so a symmetric misreading of the spec's state
allocation would survive them.  This file breaks that loop:

* the FSE decoding table is HAND-EXECUTED per RFC 8878 §4.1.1 — the
  spread step (position += (size>>1)+(size>>3)+3, masked) and the
  per-occurrence baseline/num-bits assignment are implemented
  independently here, and for the offsets channel the resulting table
  is additionally asserted against a hand-listed literal worked out on
  paper (documented inline);
* the bitstream is assembled with an independent backward-stream
  writer (not the module's ``_BitWriter``);
* the EXPECTED OUTPUT is produced twice independently of the repo
  decoder: by a ten-line RFC sequence-execution interpreter written
  here (literal copy + possibly-overlapping match copy + repeat-offset
  history), and as a hand-derived byte literal;
* the dictionary and frame bytes are SHA-256 pinned.

The frame exercises exactly the dictionary-specific machinery: all
three sequence tables in Repeat_Mode on the FIRST block (they must come
from the dictionary), repeat-offset 1 reaching INTO dictionary content,
an explicit offset that shifts the repeat history, and the
literals-length-0 repeat-offset-2 special case.
"""

from __future__ import annotations

import hashlib
import struct

from national_caseload_data_ingest_spark.sources.zstdnative import (
    zstd_decompress,
)

_DICT_MAGIC = struct.pack("<I", 0xEC30A437)
_FRAME_MAGIC = struct.pack("<I", 0xFD2FB528)


# --- independent FSE decode-table construction (RFC 8878 §4.1.1) -------------


def _rfc_dtable(counts: list[int], acc: int) -> list[tuple[int, int, int]]:
    """state -> (symbol, num_bits, baseline), straight from the RFC:
    low-probability (-1) symbols fill the top of the table one cell
    each; positive counts spread with step (size>>1)+(size>>3)+3
    skipping occupied top cells; then the i-th occurrence (in state
    order) of a symbol with count c gets x = c + i, num_bits =
    acc - (bitlength(x) - 1), baseline = (x << num_bits) - size."""
    size = 1 << acc
    table = [-1] * size
    high = size - 1
    for sym, c in enumerate(counts):
        if c == -1:
            table[high] = sym
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for sym, c in enumerate(counts):
        for _ in range(max(c, 0)):
            table[pos] = sym
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    assert pos == 0 and -1 not in table
    nxt = [c for c in counts]
    out: list[tuple[int, int, int]] = []
    for state in range(size):
        sym = table[state]
        if counts[sym] == -1:
            out.append((sym, acc, 0))
            continue
        x = nxt[sym]
        nxt[sym] += 1
        nb = acc - (x.bit_length() - 1)
        out.append((sym, nb, (x << nb) - size))
    return out


def test_rfc_spread_matches_paper_derivation():
    """Offsets table, counts [1, 0, 30, 1] at accuracy 5 (the format's
    minimum) — worked on paper.  Spread: size 32, step = 16+4+3 = 23;
    sym0 lands on state 0; sym2's 30 occurrences walk
    23, 14, 5, 28, 19, 10, 1, 24, 15, 6, 29, 20, 11, 2, 25, 16, 7, 30,
    21, 12, 3, 26, 17, 8, 31, 22, 13, 4, 27, 18; sym3 lands on state 9
    and the walk returns to 0.  Decode attributes: sym0 and sym3 have
    count 1 -> x = 1, nb = 5, baseline 0.  sym2's occurrences in
    ASCENDING STATE order (states 1,2,3,4,5,6,7,8,10,11,...) get
    x = 30..59: x = 30 -> (nb 1, base 28), x = 31 -> (nb 1, base 30),
    x = 32..59 -> (nb 0, base x - 32)."""
    t = _rfc_dtable([1, 0, 30, 1], 5)
    assert t[0] == (0, 5, 0)
    assert t[9] == (3, 5, 0)
    assert t[1] == (2, 1, 28)     # x = 30
    assert t[2] == (2, 1, 30)     # x = 31
    assert t[3] == (2, 0, 0)      # x = 32
    assert t[4] == (2, 0, 1)      # x = 33
    assert t[31] == (2, 0, 27)    # x = 59 (highest sym2 state)
    assert [sym for sym, _n, _b in t].count(2) == 30


# --- independent backward bitstream writer -----------------------------------


class _BackStream:
    """Backward bitstream per RFC 8878 §4.1: values are read highest-
    bits-first from the last byte after skipping the padding 1-bit, so
    writing = accumulate in read order at the high end, then serialize
    little-endian."""

    def __init__(self) -> None:
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        assert 0 <= value < (1 << nbits) if nbits else value == 0
        self.acc = (self.acc << nbits) | value
        self.n += nbits

    def finish(self) -> bytes:
        # padding 1-bit ABOVE the data (the reader skips leading zeros
        # of the last byte, discards the first 1, then reads data)
        v = (1 << self.n) | self.acc
        return v.to_bytes((self.n + 8) // 8, "little")


# --- independent sequence-execution interpreter ------------------------------


def _run_sequences(dict_content: bytes, rep: list[int], literals: bytes,
                   seqs: list[tuple[int, int, int]]) -> bytes:
    """(literal_length, offset_value, match_length) triples -> output,
    per RFC 8878 §3.1.1.3.2.1.1: offset_value 1..3 select the repeat
    history (rotated by one when literal_length == 0), larger values
    mean offset_value - 3; matches may overlap themselves and may reach
    into dictionary content."""
    window = bytearray(dict_content)
    out_start = len(window)
    rep = list(rep)
    li = 0
    for ll, of_val, ml in seqs:
        window += literals[li : li + ll]
        li += ll
        idx = of_val if ll else of_val + 1
        if idx == 1:
            offset = rep[0]
        elif idx == 2:
            offset = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        elif idx == 3:
            offset = rep[2]
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        elif idx == 4 and ll == 0:
            offset = rep[0] - 1
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            offset = of_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        for _ in range(ml):
            window.append(window[-offset])
    window += literals[li:]
    return bytes(window[out_start:])


# --- fixture assembly --------------------------------------------------------

DICT_CONTENT = b"ABCDEFGH"
DICT_REP = [2, 4, 8]
# channel tables (normalized counts, accuracy 5):
OF_COUNTS = [1, 0, 30, 1]  # of codes 0, 2, 3 (acc 5, format minimum)
ML_COUNTS = [16, 16]       # ml codes 0 (len 3), 1 (len 4)
LL_COUNTS = [16, 16]       # ll codes 0, 1

DICT_SHA256 = "9cabe6f2ce3442d669b79f73aa8ee6877613dc58ffa90c63a87b240a47185953"
FRAME_SHA256 = "a267847943189931f113a1f6db67a4fed0f396722e5439a499b48129cec7a9ad"

# decode-order per sequence: (ll_code, of_code, of_extra, ml_code)
SEQ_CODES = [
    (1, 0, 0, 0),   # lit 'x'; of_val 1 -> rep1 = 2; ml 3
    (1, 2, 3, 0),   # lit 'y'; of_val (1<<2)+3 = 7 -> offset 4; ml 3
    (0, 0, 0, 1),   # no lit; ll==0 & of_val 1 -> rep2; ml 4
]
SEQ_TRIPLES = [(1, 1, 3), (1, 7, 3), (0, 1, 4)]
LITERALS = b"xy"

# Hand derivation of the expected output (also computed by
# _run_sequences):
#   window = ABCDEFGH, rep = [2, 4, 8]
#   seq1: +'x'; rep1 = 2 -> copy 3 from "...GHx": H x H   -> xHxH
#   seq2: +'y'; offset 4  -> copy 3 from "...HxHy": H x H -> xHxHyHxH
#         rep = [4, 2, 4]
#   seq3: ll 0; rep2 = 2  -> copy 4 overlapping: x H x H  -> ...xHxH
EXPECTED = b"xHxHyHxHxHxH"


def _ncount_bytes(counts: list[int], acc: int) -> bytes:
    """Serialize a normalized-count table (RFC 8878 §4.1.1 header).
    Small tables only (no zero-repeat runs needed here)."""
    acc_bits = 0
    x = 0

    def emit(v: int, nb: int) -> None:
        nonlocal x, acc_bits
        x |= v << acc_bits
        acc_bits += nb

    emit(acc - 5, 4)
    size = 1 << acc
    remaining = size + 1
    threshold = size
    nb_bits = acc + 1
    i = 0
    while remaining > 1 and i < len(counts):
        c = counts[i]
        i += 1
        stored = c + 1
        maxv = (2 * threshold - 1) - remaining
        if stored < maxv:
            emit(stored, nb_bits - 1)
        elif stored < threshold:
            emit(stored, nb_bits)
        else:
            emit(stored + maxv, nb_bits)
        remaining -= -c if c < 0 else c
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
        if c == 0 and remaining > 1:
            run = 0
            while i < len(counts) and counts[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                emit(3, 2)
                run -= 3
            emit(run, 2)
    return x.to_bytes((acc_bits + 7) // 8, "little")


def build_dictionary() -> bytes:
    # direct Huffman weights (unused by the frame — literals are raw —
    # but the structured format requires a valid table): symbols 0, 1
    # explicit weight 2, implied symbol 2 weight 3
    weights_hdr = bytes([127 + 2, (2 << 4) | 2])
    return (_DICT_MAGIC + struct.pack("<I", 99) + weights_hdr
            + _ncount_bytes(OF_COUNTS, 5)
            + _ncount_bytes(ML_COUNTS, 5)
            + _ncount_bytes(LL_COUNTS, 5)
            + b"".join(struct.pack("<I", r) for r in DICT_REP)
            + DICT_CONTENT)


def _plan_chain(dtable, codes: list[int], acc: int):
    """Initial state + per-step (bits, nbits) updates realizing the
    symbol sequence, found by depth-first search over the independent
    table (RFC: new_state = baseline + read(num_bits))."""
    def dfs(state: int, i: int):
        if i == len(codes):
            return []
        sym, nb, base = dtable[state]
        for nxt in range(base, base + (1 << nb)):
            if dtable[nxt][0] != codes[i]:
                continue
            rest = dfs(nxt, i + 1)
            if rest is not None:
                return [(nxt - base, nb)] + rest
        return None

    for s0 in range(len(dtable)):
        if dtable[s0][0] != codes[0]:
            continue
        rest = dfs(s0, 1)
        if rest is not None:
            return s0, rest
    raise AssertionError("no FSE state chain realizes the code sequence")


def build_frame() -> bytes:
    of_t = _rfc_dtable(OF_COUNTS, 5)
    ml_t = _rfc_dtable(ML_COUNTS, 5)
    ll_t = _rfc_dtable(LL_COUNTS, 5)
    ll0, ll_updates = _plan_chain(ll_t, [c[0] for c in SEQ_CODES], 5)
    of0, of_updates = _plan_chain(of_t, [c[1] for c in SEQ_CODES], 5)
    ml0, ml_updates = _plan_chain(ml_t, [c[3] for c in SEQ_CODES], 5)

    w = _BackStream()
    # initial states, read order LL, OF, ML at accuracy-log bits each
    w.put(ll0, 5)
    w.put(of0, 5)
    w.put(ml0, 5)
    for i, (_llc, ofc, of_extra, _mlc) in enumerate(SEQ_CODES):
        # per-sequence extras, read order OF, ML, LL (ml/ll codes here
        # carry zero extra bits)
        w.put(of_extra, ofc)
        if i < len(SEQ_CODES) - 1:
            # state updates, read order LL, ML, OF
            w.put(*ll_updates[i])
            w.put(*ml_updates[i])
            w.put(*of_updates[i])
    seq_bits = w.finish()

    body = bytes([(len(LITERALS) << 3) | 0]) + LITERALS  # raw literals
    body += bytes([len(SEQ_CODES)])                      # nseq
    body += bytes([0b11111100])                          # all Repeat_Mode
    body += seq_bits
    block_hdr = (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
    # frame header: 1-byte dictionary id, explicit window byte, no FCS
    return (_FRAME_MAGIC + bytes([0x01, 0x58, 99])
            + block_hdr + body)


# --- tests -------------------------------------------------------------------


def test_fixture_bytes_are_frozen():
    d = build_dictionary()
    f = build_frame()
    assert hashlib.sha256(d).hexdigest() == DICT_SHA256
    assert hashlib.sha256(f).hexdigest() == FRAME_SHA256


def test_worked_example_decodes_to_hand_derived_bytes():
    got = zstd_decompress(build_frame(), dictionary=build_dictionary())
    # twice-independent expectation: the in-test RFC interpreter and
    # the hand-derived literal agree, and the repo decoder must match
    assert _run_sequences(DICT_CONTENT, DICT_REP, LITERALS,
                          SEQ_TRIPLES) == EXPECTED
    assert got == EXPECTED


def test_worked_example_requires_the_dictionary():
    import pytest

    frame = build_frame()
    with pytest.raises(NotImplementedError, match="dictionary"):
        zstd_decompress(frame)
    # raw-content dictionary (no entropy tables) cannot satisfy
    # Repeat_Mode on the first block
    with pytest.raises(ValueError):
        zstd_decompress(frame, dictionary=DICT_CONTENT)
