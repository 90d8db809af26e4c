"""Native zstd decoder (sources/zstdnative.py): every compressed
stream decoded here was produced by pyarrow's bundled REFERENCE
libzstd — compression levels are varied because they change the block
shapes (raw/RLE literals at low levels, FSE-compressed Huffman weights,
4-stream literals, and FSE-everything at high levels)."""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import pytest

from national_caseload_data_ingest_spark.sources.zstdnative import (
    strip_content_size,
    xxh64,
    zstd_decompress,
)


def _codec(level: int):
    return pa.Codec("zstd", compression_level=level)


def _corpora() -> list[bytes]:
    rng = random.Random(11)
    out = [
        b"",
        b"a",
        b"hello world",
        b"abcabcabcabc" * 50,          # short-offset repeat matches
        b"x" * 100000,                  # RLE blocks
        bytes(rng.getrandbits(8) for _ in range(5000)),  # incompressible
        ("the quick brown fox " * 400).encode(),
        bytes(range(256)) * 64,
    ]
    block = bytes(rng.getrandbits(8) for _ in range(800))
    out.append(block + bytes(70000) + block)  # long-distance matches
    return out


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_cross_validates_against_reference_encoder(level):
    codec = _codec(level)
    for i, data in enumerate(_corpora()):
        comp = bytes(codec.compress(data, asbytes=True))
        assert zstd_decompress(comp) == data, (level, i)


@pytest.mark.parametrize("level", [1, 5, 22])
def test_multi_block_frames(level):
    """Corpora past the 128 KiB block size force multi-block frames:
    treeless literals, Repeat_Mode sequence tables, and repeat offsets
    carried across block boundaries."""
    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "the", "of", "and",
             "data", "zstd", "block"]
    big_text = " ".join(rng.choice(words)
                        for _ in range(200000)).encode()
    semi = b"".join(bytes([rng.getrandbits(8)]) * rng.randint(1, 30)
                    for _ in range(30000))
    codec = _codec(level)
    for data in (big_text, semi):
        comp = bytes(codec.compress(data, asbytes=True))
        assert zstd_decompress(comp) == data


def test_multi_frame_and_skippable():
    c1 = bytes(_codec(3).compress(b"first frame ", asbytes=True))
    c2 = bytes(_codec(3).compress(b"second frame", asbytes=True))
    assert zstd_decompress(c1 + c2) == b"first frame second frame"
    skip = struct.pack("<II", 0x184D2A50, 5) + b"xxxxx"
    assert zstd_decompress(skip + c1 + skip) == b"first frame "


def test_xxh64_public_vectors_and_checksum():
    """The two canonical public xxHash64 vectors pin the checksum
    implementation; a frame with the checksum FLAG set round-trips and
    a flipped checksum fails loudly."""
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    data = ("payload " * 500).encode()
    comp = bytes(_codec(3).compress(data, asbytes=True))
    nofcs = strip_content_size(comp)
    # graft a content checksum: set FHD bit 2, append xxh64 low 32
    with_ck = bytearray(nofcs)
    with_ck[4] |= 0x04
    with_ck += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    assert zstd_decompress(bytes(with_ck)) == data
    with_ck[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(with_ck))


def test_strip_content_size_forces_native_machine():
    """strip_content_size rewrites only the header: the size-less
    frame decodes identically, zstd_frame_content_size refuses it, and
    zstd_decode routes it through the native machine."""
    from national_caseload_data_ingest_spark.sources.blockcodecs import (
        zstd_decode,
        zstd_frame_content_size,
    )
    rng = random.Random(2)
    for data in (b"", b"tiny", bytes(rng.getrandbits(8)
                                     for _ in range(5000)),
                 ("stream " * 50000).encode()):
        comp = bytes(_codec(3).compress(data, asbytes=True))
        nofcs = strip_content_size(comp)
        with pytest.raises(NotImplementedError):
            zstd_frame_content_size(nofcs)
        assert zstd_decompress(nofcs) == data
        assert zstd_decode(nofcs) == data
        assert zstd_decode(comp) == data  # fast path unchanged
        assert strip_content_size(nofcs) == nofcs  # idempotent


def test_writer_accepted_by_reference_decoder():
    """The from-scratch zstd WRITER (raw literals + predefined-FSE
    sequence encoding, the inverse state walk): every frame decodes
    byte-identically through BOTH the repo decoder and pyarrow's
    bundled reference libzstd."""
    from national_caseload_data_ingest_spark.sources.zstdnative import (
        zstd_compress,
    )
    rng = random.Random(11)
    corpora = _corpora()
    words = ["alpha", "beta", "gamma", "the", "of", "and"]
    corpora.append(" ".join(rng.choice(words)
                            for _ in range(100000)).encode())
    for i, data in enumerate(corpora):
        fr = zstd_compress(data)
        assert zstd_decompress(fr) == data, i
        assert bytes(pa.decompress(
            fr, decompressed_size=len(data), codec="zstd")) == data, i
    # compressible text actually compresses (FSE sequences emitted,
    # not just raw blocks)
    text = corpora[-1]
    assert len(zstd_compress(text)) < len(text) // 2


def test_writer_random_roundtrips():
    """Randomized shapes across the FCS size classes and the RLE /
    compressed / raw block routes."""
    from national_caseload_data_ingest_spark.sources.zstdnative import (
        zstd_compress,
    )
    rng = random.Random(20260816)
    for _ in range(40):
        kind = rng.randrange(3)
        n = rng.choice([0, 1, 5, 255, 256, 300, 5000, 70000, 140000])
        if kind == 0:
            data = bytes(rng.getrandbits(8) for _ in range(n))
        elif kind == 1:
            data = bytes([rng.getrandbits(8)]) * n
        else:
            data = b"".join(
                bytes([rng.getrandbits(8)]) * rng.randint(1, 40)
                for _ in range(n // 20 + 1))[:n]
        fr = zstd_compress(data)
        assert zstd_decompress(fr) == data
        assert bytes(pa.decompress(
            fr, decompressed_size=len(data), codec="zstd")) == data


def test_declared_size_mismatch_and_guards():
    data = b"guarded content " * 100
    comp = bytearray(_codec(3).compress(data, asbytes=True))
    # bad magic
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00" + bytes(comp[4:]))
    # dictionary frames gate: craft a header with a dictionary id
    frame = bytes([0x28, 0xB5, 0x2F, 0xFD, 0x01, 0x00, 0x07])
    with pytest.raises(NotImplementedError, match="dictionary"):
        zstd_decompress(frame)
    # reserved FHD bit
    bad = bytearray(comp)
    bad[4] |= 0x08
    with pytest.raises(ValueError, match="reserved"):
        zstd_decompress(bytes(bad))
    # declared-size mismatch: shrink the FCS field if single-segment
    fhd = comp[4]
    if fhd >> 6 == 0 and (fhd >> 5) & 1:
        bad = bytearray(comp)
        bad[5] ^= 0x01  # single-byte FCS directly after FHD
        with pytest.raises(ValueError):
            zstd_decompress(bytes(bad))


def test_corrupt_streams_raise_cleanly():
    """Random corruption must surface as a CLEAN ValueError (or decode
    without error when the flip lands in content or a cosmetic header
    bit) — never an IndexError / struct.error / hang from a
    structurally-broken stream."""
    data = ("corpus text with repeats " * 300).encode()
    comp = bytes(_codec(9).compress(data, asbytes=True))
    rng = random.Random(4)
    for trial in range(120):
        bad = bytearray(comp)
        bad[rng.randrange(4, len(bad))] ^= 1 << rng.randrange(8)
        try:
            zstd_decompress(bytes(bad))
        except (ValueError, NotImplementedError):
            pass  # the clean-gate contract
        except (IndexError, KeyError, OverflowError, MemoryError,
                struct.error) as e:  # noqa: PERF203
            pytest.fail(
                f"unclean {type(e).__name__} on trial {trial}: {e}")


def test_skippable_frame_truncation_raises():
    """Truncated skippable frames must hit the module's clean-ValueError
    contract: a cut 8-byte header must not surface struct.error, and a
    declared size past end-of-input must not silently return partial
    output."""
    payload = b"real frame content"
    comp = _codec(3).compress(payload, asbytes=True)
    skip_magic = struct.pack("<I", 0x184D2A50)
    # header cut mid-size-field
    with pytest.raises(ValueError, match="truncated"):
        zstd_decompress(skip_magic + b"\x04\x00")
    # declared body runs past end-of-input (even with a valid frame first)
    with pytest.raises(ValueError, match="truncated"):
        zstd_decompress(bytes(comp) + skip_magic
                        + struct.pack("<I", 64) + b"\x00" * 10)
    # intact skippable between frames still decodes
    ok = (skip_magic + struct.pack("<I", 3) + b"abc" + bytes(comp))
    assert zstd_decompress(ok) == payload


def test_fse_interleaved_flush_respects_symbol_limit():
    """The cross-state flush in _fse_decode_interleaved may not emit
    symbol limit+1 — corrupt weight streams surface as a ValueError at
    the weight-count check, not deep inside Huffman table build."""
    from national_caseload_data_ingest_spark.sources.zstdnative import (
        _BackBits,
        _fse_decode_interleaved,
    )
    # sentinel at bit 3: reads = s1(1), s2(1), s1-update(1), then s2's
    # update over-reads exactly when out already holds `limit` symbols
    bits = _BackBits(bytes([0b1000]))
    with pytest.raises(ValueError, match="limit"):
        _fse_decode_interleaved([(0, 1, 0)], 1, bits, 2)


# --- dictionary frames (RFC 8878 §5) ---------------------------------------
# No in-sandbox reference codec speaks dictionaries (pyarrow's Codec API
# has no dictionary parameter, no `zstandard`, stdlib zstd is 3.14+), so
# these tests validate the dictionary layer by self-roundtrip and by
# hand-assembled structured dictionaries + frames, while every
# dictionary-less path above remains reference-validated.

from national_caseload_data_ingest_spark.sources.zstdnative import (  # noqa: E402
    _MAGIC,
    _BitWriter,
    _fse_build_dtable,
    parse_dictionary,
    zstd_compress,
)

_DICT_MAGIC_BYTES = struct.pack("<I", 0xEC30A437)


def _write_ncount(counts, acc):
    """Serialize an FSE normalized-count table (inverse of
    _fse_read_ncount; fixture construction only)."""
    bits = []  # (value, nbits) forward order

    def emit(v, nb):
        bits.append((v, nb))

    emit(acc - 5, 4)
    table_size = 1 << acc
    remaining = table_size + 1
    threshold = table_size
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
    acc_bits = 0
    x = 0
    for v, nb in bits:
        x |= v << acc_bits
        acc_bits += nb
    return x.to_bytes((acc_bits + 7) // 8, "little")


def _huf_codes(weights):
    """Canonical (code, nbits) per symbol for the module's table
    layout (ascending weight, natural symbol order)."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    codes = {}
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            nb = max_bits + 1 - w
            codes[sym] = (pos >> (max_bits - nb), nb)
            pos += 1 << (w - 1)
    return codes, max_bits


def _build_structured_dict(content, rep, did=42):
    """Minimal valid structured dictionary: direct Huffman weights for
    symbols 'a'..'c' (+ implied), uniform 2-symbol FSE tables for
    OF/ML/LL, explicit repeat offsets."""
    # direct weights: n=2 explicit (a, b -> weight 2); explicit sum =
    # 2+2 = 4 -> the implied last symbol ('c') gets weight 3 (total 8)
    weights_hdr = bytes([127 + 2, (2 << 4) | 2])
    of = _write_ncount([16, 16], 5)
    ml = _write_ncount([16, 16], 5)
    ll = _write_ncount([16, 16], 5)
    reps = b"".join(struct.pack("<I", r) for r in rep)
    return (_DICT_MAGIC_BYTES + struct.pack("<I", did)
            + weights_hdr + of + ml + ll + reps + content)


def test_parse_dictionary_raw_and_structured():
    raw = parse_dictionary(b"just some window bytes")
    assert raw["id"] is None and raw["huf"] is None
    assert raw["content"] == b"just some window bytes"
    content = b"0123456789XYZW"
    d = _build_structured_dict(content, [4, 8, 12])
    got = parse_dictionary(d)
    assert got["id"] == 42
    assert got["content"] == content
    assert got["rep"] == [4, 8, 12]
    assert got["huf"] is not None
    for kind in ("of", "ml", "ll"):
        table, acc = got[kind]
        assert acc == 5 and len(table) == 32
    # truncated structured dicts hit the clean-ValueError contract
    with pytest.raises(ValueError):
        parse_dictionary(d[:16])
    with pytest.raises(ValueError, match="zero repeat"):
        parse_dictionary(_build_structured_dict(content, [0, 8, 12]))


def _frame_with_dict_id(did, body_blocks):
    """Frame header naming dictionary `did` (1 byte), explicit window,
    no FCS, followed by pre-built block bytes."""
    fhd = 0x01  # fcs_code 0, single 0, no checksum, did_code 1
    return (struct.pack("<I", _MAGIC) + bytes([fhd, 0x58, did])
            + body_blocks)


def test_structured_dict_rep_offsets_and_fse_seeding():
    """A hand-assembled frame whose FIRST block uses Repeat_Mode for
    all three sequence tables (they must come from the dictionary) and
    repeat-offset 1 (it must come from the dictionary's rep history,
    reaching into dictionary CONTENT)."""
    content = b"0123456789XYZW"
    d = _build_structured_dict(content, [4, 8, 12])
    parsed = parse_dictionary(d)
    # pick initial states decoding to the wanted codes
    def state_for(kind, sym):
        table, acc = parsed[kind]
        for s, (t_sym, _nb, _b) in enumerate(table):
            if t_sym == sym:
                return s, acc
        raise AssertionError(f"no state for {kind} symbol {sym}")
    ll_s, ll_acc = state_for("ll", 1)   # literals length 1
    of_s, of_acc = state_for("of", 0)   # of_val = 1 -> repeat offset 1
    ml_s, ml_acc = state_for("ml", 0)   # match length 3
    w = _BitWriter()
    # reverse read order: states LL, OF, ML then OF/ML/LL extras (0 bits)
    for value, nb in reversed([(ll_s, ll_acc), (of_s, of_acc),
                               (ml_s, ml_acc)]):
        w.put(value, nb)
    seq_bits = w.finish()
    body = bytes([(2 << 3) | 0]) + b"AB"     # raw literals "AB"
    body += bytes([1])                        # nseq = 1
    body += bytes([0b11111100])               # LL/OF/ML all Repeat_Mode
    body += seq_bits
    block = (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little") + body
    frame = _frame_with_dict_id(42, block)
    got = zstd_decompress(frame, dictionary=d)
    # seq: lit "A", match len 3 at rep1=4 back into (content+"A"), lit "B"
    assert got == b"A" + (content + b"A")[-4:][:3] + b"B" == b"AYZWB"
    # the same frame without the dictionary is a loud failure
    with pytest.raises(NotImplementedError, match="dictionary"):
        zstd_decompress(frame)
    # and with a mismatching embedded id
    with pytest.raises(ValueError, match="wants dictionary id"):
        zstd_decompress(frame,
                        dictionary=_build_structured_dict(content,
                                                          [4, 8, 12],
                                                          did=7))


def test_structured_dict_treeless_literals_seeding():
    """A first block with TREELESS literals must decode through the
    dictionary's Huffman table."""
    content = b"seed window"
    d = _build_structured_dict(content, [1, 4, 8])
    # the dictionary table covers literal byte values 0..2 (weights
    # are indexed by byte value)
    lits = bytes([0, 1, 2, 0, 1, 2, 0])
    weights = [2, 2, 3]  # bytes 0, 1 + implied last (byte 2, weight 3)
    codes, max_bits = _huf_codes(weights)
    w = _BitWriter()
    for ch in reversed(lits):
        c, nb = codes[ch]
        w.put(c, nb)
    stream = w.finish()
    regen, comp = len(lits), len(stream)
    hdr = bytes([3 | (0 << 2) | ((regen & 0xF) << 4),
                 ((regen >> 4) & 0x3F) | ((comp & 3) << 6),
                 comp >> 2])
    body = hdr + stream + bytes([0])  # nseq = 0
    block = (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little") + body
    frame = _frame_with_dict_id(42, block)
    assert zstd_decompress(frame, dictionary=d) == lits
    # treeless with a RAW dictionary (no entropy tables) must fail loud
    with pytest.raises(ValueError, match="no prior table"):
        zstd_decompress(
            struct.pack("<I", _MAGIC) + bytes([0x00, 0x58]) + block,
            dictionary=b"raw content only")


def test_raw_dictionary_roundtrip_and_ratio():
    """Encoder + decoder raw-content dictionary self-roundtrip: shared
    vocabulary compresses strictly better with the dictionary, decodes
    only with it, and the dictionary-less path is untouched."""
    phrases = [b"the quick brown fox ", b"jumps over the lazy dog ",
               b"hash join spark window ", b"columnar scan merge "]
    dictionary = b"".join(phrases) * 3
    rng = random.Random(3)
    for i in range(4):
        data = b"".join(rng.choice(phrases) for _ in range(50)) \
            + b"tail%d" % i
        fd = zstd_compress(data, dictionary=dictionary, dict_id=77)
        fn = zstd_compress(data)
        assert zstd_decompress(fd, dictionary=dictionary) == data
        assert len(fd) < len(fn)
        with pytest.raises(NotImplementedError, match="dictionary"):
            zstd_decompress(fd)
        # reference decoder still accepts the dictionary-less frame
        assert _codec(3).decompress(fn, len(data)) == data
