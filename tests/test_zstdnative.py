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
