"""LZ4-block / Snappy / zstd-header codecs (sources/blockcodecs.py):
every compressed fixture comes from pyarrow's bundled REFERENCE C
encoders, so each decode is a cross-implementation check."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from national_caseload_data_ingest_spark.sources.blockcodecs import (
    lz4_block_decode,
    snappy_decode,
    zstd_decode,
    zstd_frame_content_size,
)


def _corpora():
    rng = random.Random(20260816)
    out = [
        b"",
        b"a",
        b"hello world",
        b"abcabcabcabc" * 50,            # short-offset overlap copies
        b"x" * 100000,                    # max-run RLE shapes
        bytes(rng.getrandbits(8) for _ in range(5000)),  # incompressible
        ("the quick brown fox " * 400).encode(),
        bytes(range(256)) * 64,
    ]
    # structured with long-range repeats (4-byte-offset snappy copies)
    block = bytes(rng.getrandbits(8) for _ in range(800))
    out.append(block + bytes(70000) + block)
    return out


@pytest.mark.parametrize("i", range(9))
def test_lz4_block_cross_validates_against_reference_encoder(i):
    data = _corpora()[i]
    comp = pa.compress(data, codec="lz4_raw", asbytes=True)
    assert lz4_block_decode(comp, len(data)) == data


@pytest.mark.parametrize("i", range(9))
def test_snappy_cross_validates_against_reference_encoder(i):
    data = _corpora()[i]
    comp = pa.compress(data, codec="snappy", asbytes=True)
    assert snappy_decode(comp) == data


@pytest.mark.parametrize("i", range(9))
def test_lz4_encoder_accepted_by_reference_decoder(i):
    """The from-scratch LZ4 BLOCK and FRAME encoders: output decodes
    identically through the repo decoders AND pyarrow's bundled
    reference C decoder (frame headers carry a real xxh32 HC byte the
    reference verifies)."""
    from national_caseload_data_ingest_spark.sources.blockcodecs import (
        lz4_block_decode,
        lz4_block_encode,
        lz4_frame_decode,
        lz4_frame_encode,
    )
    data = _corpora()[i]
    enc = lz4_block_encode(data)
    assert lz4_block_decode(enc, len(data)) == data
    assert bytes(pa.decompress(
        enc, decompressed_size=len(data), codec="lz4_raw")) == data
    fr = lz4_frame_encode(data)
    assert lz4_frame_decode(fr) == data
    assert bytes(pa.decompress(
        fr, decompressed_size=len(data), codec="lz4")) == data


def test_xxh32_public_vectors():
    from national_caseload_data_ingest_spark.sources.blockcodecs import (
        xxh32,
    )
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"abc") == 0x32D153FF


@pytest.mark.parametrize("i", range(9))
def test_snappy_encoder_accepted_by_reference_decoder(i):
    """The from-scratch snappy ENCODER both roundtrips through the
    repo decoder and is accepted byte-for-byte by pyarrow's bundled
    reference C decoder — a two-implementation seam in each
    direction."""
    from national_caseload_data_ingest_spark.sources.blockcodecs import (
        snappy_encode,
    )
    data = _corpora()[i]
    enc = snappy_encode(data)
    assert snappy_decode(enc) == data
    assert bytes(pa.decompress(
        enc, decompressed_size=len(data), codec="snappy")) == data
    # repetitive shapes actually compress (copies are emitted)
    if data and len(set(data)) < 30 and len(data) > 1000:
        assert len(enc) < len(data) // 2


def test_zstd_header_and_decode():
    for data in _corpora():
        comp = pa.compress(data, codec="zstd", asbytes=True)
        assert zstd_frame_content_size(comp) == len(data)
        assert zstd_decode(comp) == data
    with pytest.raises(ValueError, match="magic"):
        zstd_frame_content_size(b"nope" + bytes(10))


def test_error_paths():
    data = b"hello hello hello hello"
    comp = pa.compress(data, codec="lz4_raw", asbytes=True)
    with pytest.raises(ValueError, match="expected"):
        lz4_block_decode(comp, len(data) + 1)
    with pytest.raises(ValueError):
        lz4_block_decode(comp[:-3], len(data))
    # lz4: offset 0 is invalid — token 0x04 (0 literals, matchlen 8)
    with pytest.raises(ValueError, match="invalid match offset"):
        lz4_block_decode(b"\x04\x00\x00", 8)
    scomp = pa.compress(data, codec="snappy", asbytes=True)
    with pytest.raises(ValueError):
        snappy_decode(scomp[:-2])
    with pytest.raises(ValueError, match="invalid copy offset"):
        snappy_decode(b"\x08\x01\x00\x00")  # copy before any output
    with pytest.raises(ValueError, match="preamble"):
        snappy_decode(b"")
