"""TIFF codec (pure stdlib/numpy): strips, LZW (early change + table
reset), PackBits, horizontal predictor, both photometric conventions,
honest gates for unsupported layouts, and the oracle-checked query.
Format reference: TIFF 6.0 specification §3/§7/§13/§14."""

import struct

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    _packbits_compress,
    _packbits_decompress,
    _tiff_lzw_compress,
    _tiff_lzw_decompress,
    decode_image,
    tiff_decode,
    tiff_encode,
)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"abcabcabc" * 500,
        bytes(5000),
        bytes(range(256)) * 64,
    ],
    ids=["empty", "one", "repetitive", "zeros", "ramp"],
)
def test_lzw_roundtrip(data):
    assert _tiff_lzw_decompress(_tiff_lzw_compress(data)) == data


def test_lzw_roundtrip_incompressible_crosses_all_widths_and_resets():
    """Random bytes grow the code table through every width boundary
    (9→10→11→12) and past the 4094 ClearCode reset — twice."""
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, 200_000, dtype=np.uint8))
    comp = _tiff_lzw_compress(data)
    assert _tiff_lzw_decompress(comp) == data
    assert comp.count(b"") >= 0 and len(comp) > len(data)  # incompressible


@pytest.mark.parametrize(
    "data",
    [b"", b"a" * 300, b"ab" * 200, bytes(range(200))],
)
def test_packbits_roundtrip(data):
    assert _packbits_decompress(_packbits_compress(data), len(data)) == data


@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("shape", [(12, 16), (12, 16, 3), (7, 5), (33, 13, 3)])
@pytest.mark.parametrize("rps", [None, 5])
def test_tiff_roundtrip_matrix(compression, shape, rps):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    for predictor in [False, True] if compression != "none" else [False]:
        payload = tiff_encode(
            a, compression=compression, predictor=predictor, rows_per_strip=rps
        )
        w, h, ch, px = tiff_decode(payload)
        exp = a.reshape(a.shape[0], a.shape[1], -1)
        assert (w, h, ch) == (a.shape[1], a.shape[0], exp.shape[2])
        assert np.array_equal(px, exp)


def test_tiff_big_endian_decodes():
    """An MM (big-endian) file with the same pixels decodes identically —
    built by re-packing a little-endian single-strip uncompressed file."""
    a = np.arange(48, dtype=np.uint8).reshape(6, 8)
    le = tiff_encode(a)
    # translate header + IFD to big-endian (values are all SHORT/LONG)
    (ifd_off,) = struct.unpack("<I", le[4:8])
    out = bytearray(b"MM\x00*")
    out += struct.pack(">I", ifd_off)
    out += le[8:ifd_off]
    (n,) = struct.unpack("<H", le[ifd_off : ifd_off + 2])
    out += struct.pack(">H", n)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack("<HHI", le[base : base + 8])
        out += struct.pack(">HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            (v, _pad) = struct.unpack("<HH", le[base + 8 : base + 12])
            out += struct.pack(">HH", v, 0)
        else:
            (v,) = struct.unpack("<I", le[base + 8 : base + 12])
            out += struct.pack(">I", v)
    out += struct.pack(">I", 0)
    w, h, ch, px = tiff_decode(bytes(out))
    assert (w, h, ch) == (8, 6, 1)
    assert np.array_equal(px[:, :, 0], a)


def test_tiff_whiteiszero_inverts():
    a = np.full((4, 4), 10, np.uint8)
    payload = bytearray(tiff_encode(a))
    # photometric tag (262) SHORT value 1 → 0 (WhiteIsZero)
    idx = payload.find(struct.pack("<HHI", 262, 3, 1))
    assert idx != -1
    payload[idx + 8 : idx + 10] = struct.pack("<H", 0)
    _w, _h, _ch, px = tiff_decode(bytes(payload))
    assert np.all(px == 245)


def test_tiff_honest_gates():
    a = np.zeros((4, 4), np.uint8)
    payload = bytearray(tiff_encode(a))

    def patched(tag, new_val):
        p = bytearray(payload)
        idx = p.find(struct.pack("<HHI", tag, 3, 1))
        assert idx != -1, tag
        p[idx + 8 : idx + 10] = struct.pack("<H", new_val)
        return bytes(p)

    with pytest.raises(NotImplementedError, match="compression"):
        tiff_decode(patched(259, 6))  # old-style JPEG (TIFF 6.0 §22)
    # new-style JPEG (7) is SUPPORTED since round 10; raw sample bytes
    # under that tag are corruption, not a gate
    with pytest.raises(ValueError):
        tiff_decode(patched(259, 7))
    # photometric 3 without a ColorMap tag is structural corruption
    # (paletted images themselves decode since round 10)
    with pytest.raises(ValueError, match="tag 320"):
        tiff_decode(patched(262, 3))
    # planar 2 with one sample is chunky in practice — still decodes
    _w, _h, ch, _px = tiff_decode(patched(284, 2))
    assert ch == 1
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_decode(b"GARBAGE!")
    with pytest.raises(NotImplementedError, match="gray/RGB"):
        tiff_decode(patched(258, 12))  # 12-bit samples still gate


# ---------------------------------------------------------------------------
# round-10 extensions: paletted / tiled / planar-2 layouts
# ---------------------------------------------------------------------------


def _pal16(m):
    j = np.arange(m, dtype=np.int64)
    return np.stack(
        [(j * 771) % 65536, (j * 1031) % 65536, (j * 1297) % 65536], axis=-1
    ).astype(np.uint16)


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
def test_tiff_palette_roundtrip(bits, compression):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    rng = np.random.default_rng(bits * 10)
    m = 1 << bits
    idx = rng.integers(0, m, (10, 13)).astype(np.uint8)
    p = tiff_encode_ext(
        idx, palette=_pal16(m), bits=bits, compression=compression,
        rows_per_strip=4,
    )
    w, h, ch, px = tiff_decode(p)
    assert (w, h, ch) == (13, 10, 3)
    assert px.dtype == np.uint16  # true 16-bit ColorMap samples
    assert np.array_equal(px, _pal16(m)[idx])


@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize("tile", [None, (4, 4)])
def test_tiff_rgb_layouts_roundtrip(planar, tile):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    rng = np.random.default_rng(planar * 7 + (0 if tile is None else 1))
    c = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    p = tiff_encode_ext(
        c, planar=planar, tile=tile, rows_per_strip=3,
        compression="lzw", predictor=True,
    )
    w, h, ch, px = tiff_decode(p)
    assert (w, h, ch) == (11, 9, 3)
    assert np.array_equal(px, c)


def test_tiff_tiled_edge_crop():
    """Edge tiles are encoded full-size and cropped on decode — a
    position-dependent image catches misplaced tile origins."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    g = (np.arange(10 * 13, dtype=np.int64) % 256).astype(
        np.uint8).reshape(10, 13)
    w, h, ch, px = tiff_decode(tiff_encode_ext(g, tile=(8, 4)))
    assert (w, h, ch) == (13, 10, 1)
    assert np.array_equal(px[:, :, 0], g)


def test_tiff_ext_corruption_is_valueerror():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    idx = np.zeros((4, 4), np.uint8)
    payload = bytearray(tiff_encode_ext(idx, palette=_pal16(2), bits=1))
    i = payload.find(struct.pack("<HHI", 320, 3, 6))
    assert i != -1
    struct.pack_into("<HHI", payload, i, 320, 3, 5)  # wrong count
    with pytest.raises(ValueError, match="colormap size"):
        tiff_decode(bytes(payload))

    tiled = bytearray(tiff_encode_ext(idx, tile=(4, 4)))
    i = tiled.find(struct.pack("<HHI", 322, 3, 1))
    assert i != -1
    struct.pack_into("<HHI", tiled, i, 322, 3, 1)
    struct.pack_into("<H", tiled, i + 8, 0)  # TileWidth = 0
    with pytest.raises(ValueError, match="tile geometry"):
        tiff_decode(bytes(tiled))


def test_decode_image_dispatches_tiff_without_pil():
    a = np.arange(192, dtype=np.uint8).reshape(12, 16)
    w, h, ch, px = decode_image(tiff_encode(a, compression="lzw", predictor=True))
    assert (w, h, ch) == (16, 12, 1)
    assert np.array_equal(px[:, :, 0], a)


def test_tiff_decode_features_query(spark):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_decode_features_query,
    )

    rows = tiff_decode_features_query(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:8]:
        assert (r["width"], r["height"]) == (IMG_W, IMG_H)
        assert r["channels"] == (3 if r["doc_id"] % 2 else 1)


# ---------------------------------------------------------------------------
# round-10: 16-bit samples (gray + RGB, both byte orders)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(9, 11), (9, 11, 3)])
@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize("tile", [None, (4, 4)])
def test_tiff_16bit_roundtrip(shape, planar, tile):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    if planar == 2 and len(shape) == 2:
        pytest.skip("planar 2 needs multiple samples")
    rng = np.random.default_rng(sum(shape) + planar)
    a = rng.integers(0, 65536, shape).astype(np.uint16)
    p = tiff_encode_ext(
        a, planar=planar, tile=tile, rows_per_strip=3,
        compression="lzw", predictor=True,
    )
    w, h, ch, px = tiff_decode(p)
    exp_ch = 1 if len(shape) == 2 else 3
    assert (w, h, ch) == (11, 9, exp_ch)
    assert px.dtype == np.uint16
    assert np.array_equal(px, a.reshape(9, 11, exp_ch))


def test_tiff_16bit_big_endian_hand_built():
    """An MM (big-endian) 16-bit file pins the container-byte-order
    read: the same bytes little-endian would decode to swapped values."""
    # MM header, one IFD: 2x1 gray, 16-bit, uncompressed, single strip
    ifd_off = 8 + 4  # header + pixel data (2 samples * 2 bytes)
    pixels = struct.pack(">2H", 0x0102, 0xFFEE)
    entries = [
        (256, 3, 1, 2),       # width
        (257, 3, 1, 1),       # height
        (258, 3, 1, 16),      # bits
        (259, 3, 1, 1),       # no compression
        (262, 3, 1, 1),       # BlackIsZero
        (273, 4, 1, 8),       # strip offset -> pixel data
        (277, 3, 1, 1),       # spp
        (278, 3, 1, 1),       # rows per strip
        (279, 4, 1, 4),       # strip byte count
    ]
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off) + pixels)
    out += struct.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack(">HHI", tag, typ, count)
        if typ == 3:
            out += struct.pack(">HH", value, 0)
        else:
            out += struct.pack(">I", value)
    out += struct.pack(">I", 0)
    w, h, ch, px = tiff_decode(bytes(out))
    assert (w, h, ch) == (2, 1, 1)
    assert px[0, 0, 0] == 0x0102 and px[0, 1, 0] == 0xFFEE


def test_tiff_16bit_whiteiszero_inverts_wide():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    a = np.full((2, 2), 10, np.uint16)
    payload = bytearray(tiff_encode_ext(a))
    idx = payload.find(struct.pack("<HHI", 262, 3, 1))
    assert idx != -1
    payload[idx + 8 : idx + 10] = struct.pack("<H", 0)
    _w, _h, _ch, px = tiff_decode(bytes(payload))
    assert px.dtype == np.uint16
    assert np.all(px == 65525)


def test_tiff_mixed_depths_still_gate():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    rgb = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(tiff_encode_ext(rgb))
    idx = payload.find(struct.pack("<3H", 8, 8, 8))
    assert idx != -1
    payload[idx : idx + 2] = struct.pack("<H", 16)  # bits = [16, 8, 8]
    with pytest.raises(NotImplementedError, match="uniform"):
        tiff_decode(bytes(payload))


# ---------------------------------------------------------------------------
# round-10: new-style JPEG-in-TIFF (compression 7, self-contained segments)
# ---------------------------------------------------------------------------


def _block_constant_gray():
    """16x24 gray, constant per 8x8 block — decodes bit-exactly through
    DC-only JPEG blocks (the codec fixtures' exactness construction)."""
    m = np.arange(6, dtype=np.int64).reshape(2, 3)
    vals = 128 + 2 * (m % 64 - 32)
    return np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)


@pytest.mark.parametrize(
    "kw", [{}, {"rows_per_strip": 8}, {"tile": (8, 8)}],
    ids=["whole", "strips", "tiled"],
)
def test_tiff_jpeg_compression_roundtrip(kw):
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    g = _block_constant_gray()
    w, h, ch, px = tiff_decode(tiff_encode_ext(g, compression="jpeg", **kw))
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(px[:, :, 0], g)


def test_tiff_jpeg_rgb_roundtrip():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    c = np.stack([_block_constant_gray()] * 3, -1)
    w, h, ch, px = tiff_decode(tiff_encode_ext(c, compression="jpeg"))
    assert (w, h, ch) == (24, 16, 3)
    assert np.array_equal(px, c)


@pytest.mark.parametrize(
    "kw", [{}, {"rows_per_strip": 8}, {"tile": (8, 8)}],
    ids=["whole", "strips", "tiled"],
)
def test_tiff_jpeg_abbreviated_streams_roundtrip(kw):
    """JPEGTables (tag 347, TTN2): shared DQT/DHT tables spliced in
    front of each abbreviated segment."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    g = _block_constant_gray()
    p = tiff_encode_ext(g, compression="jpeg", jpeg_tables=True, **kw)
    w, h, ch, px = tiff_decode(p)
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(px[:, :, 0], g)
    if kw:  # multi-segment files genuinely shrink vs self-contained
        assert len(p) < len(tiff_encode_ext(g, compression="jpeg", **kw))


def test_tiff_jpeg_malformed_tables_are_valueerror():
    """A junk JPEGTables payload (no SOI/EOI bracket) is corruption."""
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    payload = bytearray(tiff_encode_ext(_block_constant_gray(),
                                        compression="jpeg"))
    # rewrite some harmless tag's id to 347: tag 278 (RowsPerStrip)
    i = payload.find(struct.pack("<HHI", 278, 3, 1))
    assert i != -1
    struct.pack_into("<H", payload, i, 347)
    with pytest.raises(ValueError, match="JPEGTables"):
        tiff_decode(bytes(payload))


def test_tiff_jpeg_geometry_mismatch_is_valueerror():
    from national_caseload_data_ingest_spark.operators.multimodal import (
        tiff_encode_ext,
    )

    payload = bytearray(tiff_encode_ext(_block_constant_gray(),
                                        compression="jpeg"))
    i = payload.find(struct.pack("<HHI", 256, 3, 1))
    assert i != -1
    payload[i + 8 : i + 10] = struct.pack("<H", 23)  # lie about width
    with pytest.raises(ValueError, match="geometry disagrees"):
        tiff_decode(bytes(payload))
