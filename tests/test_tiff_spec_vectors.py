"""Spec-derived TIFF conformance vectors (TIFF 6.0 spec).

VERDICT r13 "what's missing" #2 lists TIFF among the formats validated
only against the repo's own encoder.  These vectors are hand-assembled
in-test from the public TIFF 6.0 spec — the IFD layout is built by a
local helper, and the COMPRESSED STREAMS are written out as hand-derived
byte/code literals, NOT by any encoder:

* PACKBITS (spec §9): the strip streams are literal byte strings worked
  out on paper (repeat runs with negative headers, literal runs), two
  strips via RowsPerStrip;
* LZW (spec §13): the code stream is the hand-simulated sequence
  [Clear, 'A', 'B', 258, 258, 258, EOI] whose table evolution is
  documented inline, packed 9 bits MSB-first by a four-line local
  packer;
* 16-BIT / BIG-ENDIAN / PREDICTOR 2: uncompressed "MM" file whose
  stored horizontal differences (including a negative one as 0xFFF0)
  reconstruct to hand-known 16-bit values.

Expected pixels are hand literals; all three files are SHA-256 pinned.
The repo encoder is never imported.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from national_caseload_data_ingest_spark.operators.multimodal import (
    tiff_decode,
)


def _ifd(bo: str, entries: list[tuple[int, int, list[int]]],
         data_blobs: dict[int, bytes]) -> bytes:
    """Little helper: header + single IFD + out-of-line data.  Entries
    are (tag, type, values); values that fit in 4 bytes inline, blobs
    (strip data) are appended and their offsets patched via the
    sentinel value 0xDEAD0000 + key."""
    type_fmt = {1: "B", 3: "H", 4: "I"}
    type_size = {1: 1, 3: 2, 4: 4}
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM",
                         42, 8)
    out = bytearray(header)
    n = len(entries)
    ifd = bytearray(struct.pack(bo + "H", n))
    tail = bytearray()
    tail_base = 8 + 2 + 12 * n + 4
    patch: list[tuple[str, int, int]] = []  # (where, pos, blob_key)
    for tag, typ, vals in sorted(entries):
        ent = struct.pack(bo + "HHI", tag, typ, len(vals))
        total = type_size[typ] * len(vals)
        if len(vals) == 1 and vals[0] >= 0xDEAD0000:
            patch.append(("ifd", len(ifd) + 8, vals[0] - 0xDEAD0000))
            ent += struct.pack(bo + "I", 0)
        elif total <= 4:
            raw = struct.pack(f"{bo}{len(vals)}{type_fmt[typ]}", *vals)
            ent += raw + b"\x00" * (4 - total)
        else:
            ent += struct.pack(bo + "I", tail_base + len(tail))
            for v in vals:
                if v >= 0xDEAD0000:
                    patch.append(("tail", len(tail), v - 0xDEAD0000))
                    v = 0
                tail += struct.pack(bo + type_fmt[typ], v)
        ifd += ent
    ifd += struct.pack(bo + "I", 0)  # next IFD
    blob_offsets = {}
    for key, blob in data_blobs.items():
        blob_offsets[key] = tail_base + len(tail)
        tail += blob
    for where, pos, key in patch:
        target = ifd if where == "ifd" else tail
        target[pos : pos + 4] = struct.pack(bo + "I", blob_offsets[key])
    out += ifd + tail
    return bytes(out)


# --- vector 1: PackBits, two strips ------------------------------------------

# rows 0-1 = AAAA BCDE; rows 2-3 = FFFF FFGH (hand-derived streams:
# repeat run = (257 - n) header + byte, literal run = (n - 1) header)
PB_STRIP1 = bytes([0xFD, 0x41, 0x03, 0x42, 0x43, 0x44, 0x45])
PB_STRIP2 = bytes([0xFB, 0x46, 0x01, 0x47, 0x48])
PB_EXPECTED = [
    [65, 65, 65, 65], [66, 67, 68, 69],
    [70, 70, 70, 70], [70, 70, 71, 72],
]
PB_SHA256 = "0a012745e450a6794c9864503bf8c82f736bcceb82fd4903bc9161d6523b0220"


def build_packbits() -> bytes:
    return _ifd("<", [
        (256, 3, [4]), (257, 3, [4]),            # 4 x 4
        (258, 3, [8]), (259, 3, [32773]),        # 8-bit, PackBits
        (262, 3, [1]), (277, 3, [1]),            # gray, 1 sample
        (278, 3, [2]),                           # RowsPerStrip 2
        (273, 4, [0xDEAD0000, 0xDEAD0001]),      # strip offsets
        (279, 4, [len(PB_STRIP1), len(PB_STRIP2)]),
    ], {0: PB_STRIP1, 1: PB_STRIP2})


# --- vector 2: LZW, hand-simulated code stream -------------------------------

# Decode walk (spec §13): Clear resets the table (next entry 258);
# 'A' -> out A; 'B' -> out B, add 258 = "AB"; 258 -> out AB, add
# 259 = "BA"; 258 -> out AB, add 260 = "ABA"; 258 -> out AB, add 261;
# EOI.  Output = "ABABABAB" (two 4-pixel rows, one strip).
LZW_CODES = [256, 65, 66, 258, 258, 258, 257]
LZW_EXPECTED = [[65, 66, 65, 66], [65, 66, 65, 66]]
LZW_SHA256 = "760a5256cee6ac39686a8a68934ce53d71caa6c1f6a3f6166a6b52667d1a05e4"


def _pack9(codes: list[int]) -> bytes:
    acc = 0
    n = 0
    for c in codes:
        acc = (acc << 9) | c
        n += 9
    pad = (-n) % 8
    return (acc << pad).to_bytes((n + pad) // 8, "big")


def build_lzw() -> bytes:
    strip = _pack9(LZW_CODES)
    return _ifd("<", [
        (256, 3, [4]), (257, 3, [2]),
        (258, 3, [8]), (259, 3, [5]),            # LZW
        (262, 3, [1]), (277, 3, [1]),
        (278, 3, [2]),
        (273, 4, [0xDEAD0000]),
        (279, 4, [len(strip)]),
    ], {0: strip})


# --- vector 3: big-endian 16-bit, predictor 2 --------------------------------

# stored horizontal differences per row: [1000, +16, -16] -> pixels
# [1000, 1016, 1000]; row 2: [40000, -1, +2] -> [40000, 39999, 40001]
# (the negative difference wraps mod 65536: 0xFFF0 / 0xFFFF)
P16_STORED = [[1000, 16, 0xFFF0], [40000, 0xFFFF, 2]]
P16_EXPECTED = [[1000, 1016, 1000], [40000, 39999, 40001]]
P16_SHA256 = "b9606f5382d57d1ae21612106bb8d8d3189656c7806c3f973a7908388984ae02"


def build_pred16() -> bytes:
    strip = b"".join(struct.pack(">H", v) for row in P16_STORED
                     for v in row)
    return _ifd(">", [
        (256, 3, [3]), (257, 3, [2]),
        (258, 3, [16]), (259, 3, [1]),           # uncompressed
        (262, 3, [1]), (277, 3, [1]),
        (278, 3, [2]),
        (317, 3, [2]),                           # horizontal predictor
        (273, 4, [0xDEAD0000]),
        (279, 4, [len(strip)]),
    ], {0: strip})


# --- tests -------------------------------------------------------------------


def test_vectors_are_frozen():
    assert hashlib.sha256(build_packbits()).hexdigest() == PB_SHA256
    assert hashlib.sha256(build_lzw()).hexdigest() == LZW_SHA256
    assert hashlib.sha256(build_pred16()).hexdigest() == P16_SHA256


def test_packbits_strips_decode_to_hand_literals():
    w, h, ch, arr = tiff_decode(build_packbits())
    assert (w, h, ch) == (4, 4, 1)
    assert np.array_equal(arr[:, :, 0],
                          np.array(PB_EXPECTED, dtype=np.uint8))


def test_lzw_hand_code_stream_decodes():
    w, h, ch, arr = tiff_decode(build_lzw())
    assert (w, h, ch) == (4, 2, 1)
    assert np.array_equal(arr[:, :, 0],
                          np.array(LZW_EXPECTED, dtype=np.uint8))


def test_bigendian_16bit_predictor_reconstructs():
    w, h, ch, arr = tiff_decode(build_pred16())
    assert (w, h, ch) == (3, 2, 1)
    assert arr.dtype == np.uint16
    assert np.array_equal(arr[:, :, 0],
                          np.array(P16_EXPECTED, dtype=np.uint16))
