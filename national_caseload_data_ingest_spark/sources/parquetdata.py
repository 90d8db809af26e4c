"""Native parquet DATA-PAGE reader — pure stdlib + the repo's own
codecs, from the public parquet-format specification.

``parquetmeta.py`` reads footers (metadata-only maintenance); this
module reads the DATA: column chunks, page headers (the same Thrift
compact walker), definition levels, and the value encodings — so an
executor holding raw parquet bytes can materialize columns without any
Arrow/JVM reader in the loop, and the engine's native codec family
(snappy, zstd, LZ4 — ``blockcodecs.py``/``zstdnative.py``) gets a
production consumer.  Implemented:

* **column chunks**: per row group, pages laid out contiguously from
  ``dictionary_page_offset``/``data_page_offset`` for
  ``total_compressed_size`` bytes;
* **page headers**: Thrift compact structs (PageHeader: type,
  un/compressed sizes, DataPageHeader(V1): num_values / encoding /
  level encodings, DataPageHeaderV2: level byte lengths +
  is_compressed, DictionaryPageHeader);
* **codecs**: UNCOMPRESSED, SNAPPY (native), GZIP (zlib), ZSTD (the
  native machine / reference routing), LZ4_RAW (native block decode);
  LZO/brotli/legacy-LZ4 gate;
* **levels**: the RLE/bit-packed hybrid (LSB-first bit-packed groups
  of 8, little-endian RLE runs), 4-byte-length-prefixed in v1 data
  pages, raw-length-given in v2; flat schemas only (max definition
  level 0 or 1 — nested repetition gates loudly);
* **values**: PLAIN for boolean (bit-packed) / int32 / int64 / float /
  double / byte_array (u32-length-prefixed) / fixed_len_byte_array /
  int96 (raw 12 bytes; ``int96_to_micros`` converts Spark's legacy
  timestamps), PLAIN_DICTIONARY / RLE_DICTIONARY (bit-width byte +
  hybrid indices into the dictionary page), DELTA_BINARY_PACKED
  (miniblock bit-packed zigzag deltas with physical-width wraparound
  and data-less trailing miniblocks), DELTA_LENGTH_BYTE_ARRAY, and
  DELTA_BYTE_ARRAY (incremental prefix encoding), and
  BYTE_STREAM_SPLIT (per-byte streams for fixed-width types) — every
  value encoding the format defines for flat columns.

Cross-validation: every file the tests read is written by pyarrow or
Spark (the reference writers) across codec × dictionary × page-version
rotations, and every value list is compared against pyarrow's own
read — the same independent-implementation contract as the footer
reader.

Spark shape: a per-payload kernel (one task per file/row-group), zero
shuffle — the native-read twin of ``spark.read.parquet`` for the flat
case, used where holding bytes (txlog payloads, object-store blobs)
beats standing up a scan.
"""

from __future__ import annotations

import struct
import zlib

from national_caseload_data_ingest_spark.sources.parquetmeta import (
    _Reader,
    read_footer,
)

_PLAIN, _PLAIN_DICT, _RLE, _RLE_DICT = 0, 2, 3, 8

_CODEC_UNCOMPRESSED, _CODEC_SNAPPY, _CODEC_GZIP = 0, 1, 2
_CODEC_ZSTD, _CODEC_LZ4_RAW = 6, 7


def _uvarint(d: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = d[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("parquet: runaway varint")


def _rle_bp_hybrid(d: bytes, pos: int, bit_width: int,
                   count: int) -> tuple[list[int], int]:
    """The RLE/bit-packed hybrid (parquet-format Encodings.md)."""
    out: list[int] = []
    if bit_width == 0:
        return [0] * count, pos
    mask = (1 << bit_width) - 1
    while len(out) < count:
        header, pos = _uvarint(d, pos)
        if header & 1:  # bit-packed: (header>>1) groups of 8 values
            n = (header >> 1) * 8
            nbytes = (n * bit_width + 7) // 8
            chunk = d[pos : pos + nbytes]
            if len(chunk) != nbytes:
                raise ValueError("parquet: truncated bit-packed run")
            pos += nbytes
            acc = int.from_bytes(chunk, "little")
            take = min(n, count - len(out))
            out.extend((acc >> (i * bit_width)) & mask
                       for i in range(take))
        else:  # RLE run: fixed-width little-endian value
            run = header >> 1
            width = (bit_width + 7) // 8
            val = int.from_bytes(d[pos : pos + width], "little")
            pos += width
            out.extend([val] * min(run, count - len(out)))
    return out, pos


def _zigzag_varint(d: bytes, pos: int) -> tuple[int, int]:
    z, pos = _uvarint(d, pos)
    return (z >> 1) ^ -(z & 1), pos


def _delta_binary_packed(d: bytes, pos: int, count_expected: int,
                         bits: int) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (parquet-format Encodings.md §5): ULEB128
    header (block size, miniblocks/block, total count, zigzag first
    value), then per block a zigzag min-delta, one bit-width byte per
    miniblock, and LSB-first bit-packed delta miniblocks — data bytes
    are present only for miniblocks that still carry values; values
    wrap at the column's physical width."""
    block_size, pos = _uvarint(d, pos)
    mb_per_block, pos = _uvarint(d, pos)
    total, pos = _uvarint(d, pos)
    first, pos = _zigzag_varint(d, pos)
    if mb_per_block == 0 or block_size % max(mb_per_block, 1):
        raise ValueError("parquet: bad delta block geometry")
    vpm = block_size // mb_per_block
    if vpm % 32:
        raise ValueError("parquet: miniblock size not a multiple of 32")
    if total != count_expected:
        raise ValueError(
            f"parquet: delta header count {total} != page count "
            f"{count_expected}")
    lim = 1 << (bits - 1)

    def wrap(v: int) -> int:
        return (v + lim) % (1 << bits) - lim

    if total == 0:
        return [], pos
    out = [wrap(first)]
    remaining = total - 1
    cur = first
    while remaining > 0:
        min_delta, pos = _zigzag_varint(d, pos)
        widths = d[pos : pos + mb_per_block]
        pos += mb_per_block
        for w in widths:
            if remaining <= 0:
                break  # trailing miniblocks carry no data bytes
            nbytes = w * vpm // 8
            acc = int.from_bytes(d[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << w) - 1
            take = min(vpm, remaining)
            for i in range(take):
                cur = cur + min_delta + ((acc >> (i * w)) & mask)
                out.append(wrap(cur))
            remaining -= take
    return out, pos


def _delta_length_byte_array(d: bytes, pos: int,
                             count: int) -> tuple[list[bytes], int]:
    """DELTA_LENGTH_BYTE_ARRAY: DELTA_BINARY_PACKED lengths followed
    by the concatenated value bytes."""
    lengths, pos = _delta_binary_packed(d, pos, count, 32)
    out = []
    for n in lengths:
        if n < 0 or pos + n > len(d):
            raise ValueError("parquet: bad delta-length value")
        out.append(bytes(d[pos : pos + n]))
        pos += n
    return out, pos


def _delta_byte_array(d: bytes, pos: int,
                      count: int) -> tuple[list[bytes], int]:
    """DELTA_BYTE_ARRAY (incremental encoding): shared-prefix lengths
    via DELTA_BINARY_PACKED, suffixes via DELTA_LENGTH_BYTE_ARRAY;
    value i = value[i-1][:prefix_len[i]] + suffix[i]."""
    prefixes, pos = _delta_binary_packed(d, pos, count, 32)
    suffixes, pos = _delta_length_byte_array(d, pos, count)
    out: list[bytes] = []
    prev = b""
    for p, s in zip(prefixes, suffixes):
        if p < 0 or p > len(prev):
            raise ValueError("parquet: prefix length exceeds previous "
                             "value")
        prev = prev[:p] + s
        out.append(prev)
    return out, pos


def _plain_values(d: bytes, pos: int, phys: int, count: int,
                  type_length: int = 0) -> tuple[list, int]:
    out: list = []
    if phys == 0:  # boolean: bit-packed LSB-first
        nbytes = (count + 7) // 8
        acc = int.from_bytes(d[pos : pos + nbytes], "little")
        out = [bool((acc >> i) & 1) for i in range(count)]
        return out, pos + nbytes
    if phys in (1, 2, 4, 5):
        fmt, width = {1: ("<i", 4), 2: ("<q", 8),
                      4: ("<f", 4), 5: ("<d", 8)}[phys]
        end = pos + width * count
        out = [v[0] for v in struct.iter_unpack(fmt, d[pos:end])]
        if len(out) != count:
            raise ValueError("parquet: truncated plain values")
        return out, end
    if phys == 3:  # int96: raw 12 bytes (legacy timestamps)
        for _ in range(count):
            out.append(bytes(d[pos : pos + 12]))
            pos += 12
        return out, pos
    if phys == 6:  # byte_array: u32 LE length prefix
        for _ in range(count):
            n = struct.unpack_from("<I", d, pos)[0]
            pos += 4
            out.append(bytes(d[pos : pos + n]))
            pos += n
        return out, pos
    if phys == 7:  # fixed_len_byte_array
        for _ in range(count):
            out.append(bytes(d[pos : pos + type_length]))
            pos += type_length
        return out, pos
    raise NotImplementedError(f"parquet: physical type {phys}")


def _decompress(codec: int, payload: bytes, out_size: int) -> bytes:
    if codec == _CODEC_UNCOMPRESSED:
        return payload
    if codec == _CODEC_SNAPPY:
        from national_caseload_data_ingest_spark.sources.blockcodecs import (  # noqa: PLC0415
            snappy_decode,
        )
        return snappy_decode(payload)
    if codec == _CODEC_GZIP:
        return zlib.decompress(payload, wbits=31)
    if codec == _CODEC_ZSTD:
        from national_caseload_data_ingest_spark.sources.blockcodecs import (  # noqa: PLC0415
            zstd_decode,
        )
        return zstd_decode(payload)
    if codec == _CODEC_LZ4_RAW:
        from national_caseload_data_ingest_spark.sources.blockcodecs import (  # noqa: PLC0415
            lz4_block_decode,
        )
        return lz4_block_decode(payload, out_size)
    raise NotImplementedError(f"parquet: compression codec {codec}")


def schema_leaves(fm: dict) -> dict[str, dict]:
    """Flat-schema leaves: name → {phys, optional, type_length}.
    Nested schemas (group leaves below the root) gate loudly."""
    elems = fm.get(2, [])
    if not elems:
        raise ValueError("parquet: empty schema")
    out: dict[str, dict] = {}
    for el in elems[1:]:
        if el.get(5):  # num_children on a non-root element
            raise NotImplementedError(
                "parquet: nested schemas not supported by the native "
                "data reader (flat columns only)")
        name = el.get(4, b"").decode("utf-8")
        logical = el.get(10, {})
        out[name] = {
            "phys": el.get(1),
            "optional": el.get(3, 0) == 1,
            "type_length": el.get(2, 0),
            # UTF8: ConvertedType 0 (field 6) or LogicalType.STRING
            # (field 10, member 1)
            "utf8": el.get(1) == 6 and (el.get(6) == 0
                                        or 1 in logical),
        }
        if el.get(3, 0) == 2:
            raise NotImplementedError(
                "parquet: repeated fields not supported")
    return out


def _read_chunk(data: bytes, md: dict, leaf: dict) -> list:
    """One column chunk → python values (None where the definition
    level says null)."""
    codec = md.get(4, 0)
    n_values = md.get(5, 0)
    start = md.get(11, md.get(9))
    if start is None:
        raise ValueError("parquet: chunk missing data page offset")
    if 11 in md and 9 in md:
        start = min(md[11], md[9])
    total = md.get(7)
    chunk = data[start : start + total]
    r = _Reader(chunk)
    dictionary: list | None = None
    phys = leaf["phys"]
    tl = leaf["type_length"]
    optional = leaf["optional"]
    out: list = []
    while len(out) < n_values:
        hdr = r.struct()
        ptype = hdr.get(1)
        comp_size = hdr.get(3)
        unc_size = hdr.get(2)
        payload = chunk[r.pos : r.pos + comp_size]
        if len(payload) != comp_size:
            raise ValueError("parquet: truncated page")
        r.pos += comp_size
        if ptype == 2:  # dictionary page
            dph = hdr.get(7, {})
            raw = _decompress(codec, payload, unc_size)
            dictionary, _ = _plain_values(
                raw, 0, phys, dph.get(1, 0), tl)
            continue
        if ptype == 0:  # data page v1
            dph = hdr.get(5, {})
            nv = dph.get(1, 0)
            enc = dph.get(2, 0)
            raw = _decompress(codec, payload, unc_size)
            pos = 0
            levels = None
            if optional:
                if dph.get(3, _RLE) != _RLE:
                    raise NotImplementedError(
                        "parquet: non-RLE definition levels")
                ln = struct.unpack_from("<I", raw, pos)[0]
                pos += 4
                levels, _ = _rle_bp_hybrid(raw, pos, 1, nv)
                pos += ln
            out += _decode_values(raw, pos, enc, phys, tl, nv,
                                  levels, dictionary)
        elif ptype == 3:  # data page v2
            dph = hdr.get(8, {})
            nv = dph.get(1, 0)
            n_nulls = dph.get(2, 0)
            enc = dph.get(4, 0)
            dl_len = dph.get(5, 0)
            rl_len = dph.get(6, 0)
            if rl_len:
                raise NotImplementedError(
                    "parquet: repetition levels (nested) in v2 page")
            is_comp = dph.get(7, True)
            levels = None
            lpos = 0
            if optional:
                levels, _ = _rle_bp_hybrid(payload, lpos, 1, nv)
            body = payload[dl_len:]
            raw = _decompress(codec, body, unc_size - dl_len) \
                if is_comp else body
            del n_nulls
            out += _decode_values(raw, 0, enc, phys, tl, nv,
                                  levels, dictionary)
        else:
            raise NotImplementedError(f"parquet: page type {ptype}")
    return out


def _decode_values(raw: bytes, pos: int, enc: int, phys: int, tl: int,
                   nv: int, levels: list[int] | None,
                   dictionary: list | None) -> list:
    n_present = nv if levels is None else sum(levels)
    if enc == _PLAIN:
        vals, _ = _plain_values(raw, pos, phys, n_present, tl)
    elif enc in (_PLAIN_DICT, _RLE_DICT):
        if dictionary is None:
            raise ValueError("parquet: dictionary encoding without a "
                             "dictionary page")
        bw = raw[pos]
        idx, _ = _rle_bp_hybrid(raw, pos + 1, bw, n_present)
        try:
            vals = [dictionary[i] for i in idx]
        except IndexError:
            raise ValueError(
                "parquet: dictionary index out of range") from None
    elif enc == _RLE and phys == 0:
        ln = struct.unpack_from("<I", raw, pos)[0]
        bits, _ = _rle_bp_hybrid(raw, pos + 4, 1, n_present)
        vals = [bool(b) for b in bits]
        del ln
    elif enc == 5:  # DELTA_BINARY_PACKED
        if phys not in (1, 2):
            raise ValueError(
                "parquet: DELTA_BINARY_PACKED on a non-integer column")
        vals, _ = _delta_binary_packed(
            raw, pos, n_present, 32 if phys == 1 else 64)
    elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
        if phys != 6:
            raise ValueError(
                "parquet: DELTA_LENGTH_BYTE_ARRAY on a non-byte-array")
        vals, _ = _delta_length_byte_array(raw, pos, n_present)
    elif enc == 7:  # DELTA_BYTE_ARRAY
        if phys != 6:
            raise ValueError(
                "parquet: DELTA_BYTE_ARRAY on a non-byte-array")
        vals, _ = _delta_byte_array(raw, pos, n_present)
    elif enc == 9:  # BYTE_STREAM_SPLIT
        widths = {1: 4, 2: 8, 4: 4, 5: 8, 7: tl}
        if phys not in widths or not widths[phys]:
            raise ValueError(
                "parquet: BYTE_STREAM_SPLIT needs a fixed-width type")
        w = widths[phys]
        body = raw[pos : pos + w * n_present]
        if len(body) != w * n_present:
            raise ValueError("parquet: truncated byte-stream-split")
        joined = bytes(body[j * n_present + i]
                       for i in range(n_present) for j in range(w))
        vals, _ = _plain_values(joined, 0, phys, n_present, tl)
    else:
        raise NotImplementedError(f"parquet: value encoding {enc}")
    if levels is None:
        return vals
    it = iter(vals)
    return [next(it) if lv else None for lv in levels]


_JULIAN_UNIX_EPOCH = 2440588


def int96_to_micros(raw: bytes) -> int:
    """Legacy INT96 timestamp (what Spark writes by default) →
    microseconds since the Unix epoch: 8-byte LE nanoseconds-of-day
    followed by 4-byte LE Julian day."""
    if len(raw) != 12:
        raise ValueError("parquet: int96 value must be 12 bytes")
    nanos = int.from_bytes(raw[:8], "little")
    jday = int.from_bytes(raw[8:], "little")
    return (jday - _JULIAN_UNIX_EPOCH) * 86_400_000_000 + nanos // 1000


def read_column(data: bytes, name: str) -> list:
    """All values of flat column ``name`` across every row group, in
    row order (None for nulls)."""
    fm = read_footer(data)
    leaves = schema_leaves(fm)
    if name not in leaves:
        raise ValueError(f"parquet: no column {name!r}")
    leaf = leaves[name]
    out: list = []
    for rg in fm.get(4, []):
        for chunk in rg.get(1, []):
            md = chunk.get(3)
            if md is None:
                raise ValueError("parquet: chunk without metadata")
            path = [p.decode("utf-8") for p in md.get(3, [])]
            if path == [name]:
                out += _read_chunk(data, md, leaf)
    if leaf["utf8"]:
        out = [v.decode("utf-8") if v is not None else None
               for v in out]
    return out


def read_table_native(data: bytes) -> dict[str, list]:
    """Every flat column → values; the native-read twin of a full
    scan."""
    fm = read_footer(data)
    return {name: read_column(data, name)
            for name in schema_leaves(fm)}


# --- native WRITER -----------------------------------------------------------

_T_I32, _T_I64, _T_BINARY, _T_LIST, _T_STRUCT = 5, 6, 8, 9, 12


def _t_uvarint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return


def _t_zigzag(out: bytearray, n: int) -> None:
    _t_uvarint(out, (n << 1) ^ (n >> 63) if n < 0 else n << 1)


def _t_struct(fields: list[tuple[int, int, object]]) -> bytes:
    """Thrift compact struct writer (the reader's twin): fields are
    (id, type, value) in ascending id order; values are ints (zigzag),
    bytes (varint-length), (etype, [elements]) lists, or nested struct
    bytes."""
    out = bytearray()
    prev = 0
    for fid, tt, v in fields:
        delta = fid - prev
        if 1 <= delta <= 15:
            out.append((delta << 4) | tt)
        else:
            out.append(tt)
            _t_zigzag(out, fid)
        prev = fid
        if tt in (_T_I32, _T_I64):
            _t_zigzag(out, v)
        elif tt == _T_BINARY:
            _t_uvarint(out, len(v))
            out += v
        elif tt == _T_LIST:
            etype, elems = v
            if len(elems) < 15:
                out.append((len(elems) << 4) | etype)
            else:
                out.append(0xF0 | etype)
                _t_uvarint(out, len(elems))
            for e in elems:
                if etype in (_T_I32, _T_I64):
                    _t_zigzag(out, e)
                elif etype == _T_BINARY:
                    _t_uvarint(out, len(e))
                    out += e
                elif etype == _T_STRUCT:
                    out += e
                else:
                    raise ValueError(f"thrift: list etype {etype}")
        elif tt == _T_STRUCT:
            out += v
        else:
            raise ValueError(f"thrift: writer type {tt}")
    out.append(0)  # STOP
    return bytes(out)


_WRITE_PHYS = {"boolean": 0, "int32": 1, "int64": 2, "float": 4,
               "double": 5, "binary": 6, "string": 6}
_WRITE_CODECS = {"none": 0, "snappy": 1, "gzip": 2, "zstd": 6}


def _plain_encode(values: list, typ: str) -> bytes:
    out = bytearray()
    if typ == "boolean":
        acc = 0
        for i, v in enumerate(values):
            if v:
                acc |= 1 << i
        return acc.to_bytes((len(values) + 7) // 8, "little")
    if typ in ("int32", "int64", "float", "double"):
        fmt = {"int32": "<i", "int64": "<q", "float": "<f",
               "double": "<d"}[typ]
        for v in values:
            out += struct.pack(fmt, v)
        return bytes(out)
    for v in values:  # string / binary
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out += struct.pack("<I", len(b)) + b
    return bytes(out)


def write_parquet(cols: dict[str, list], types: dict[str, str],
                  codec: str = "snappy") -> bytes:
    """Native parquet WRITER (the reader's twin): one row group, one
    PLAIN v1 data page per column, RLE/bit-packed definition levels
    for nullable columns, thrift-compact page headers and footer —
    pages compressed by the repo's OWN snappy/zstd encoders (or zlib
    gzip / stored).  Validated by pyarrow reading the output
    byte-for-byte."""
    codec_id = _WRITE_CODECS[codec]

    def compress(raw: bytes) -> bytes:
        if codec == "none":
            return raw
        if codec == "snappy":
            from national_caseload_data_ingest_spark.sources.blockcodecs import (  # noqa: PLC0415
                snappy_encode,
            )
            return snappy_encode(raw)
        if codec == "zstd":
            from national_caseload_data_ingest_spark.sources.zstdnative import (  # noqa: PLC0415
                zstd_compress,
            )
            return zstd_compress(raw)
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()

    names = list(cols)
    n_rows = len(cols[names[0]]) if names else 0
    out = bytearray(b"PAR1")
    chunk_metas = []
    for name in names:
        typ = types[name]
        values = cols[name]
        if len(values) != n_rows:
            raise ValueError("parquet: ragged columns")
        present = [v for v in values if v is not None]
        body = bytearray()
        # definition levels: bit-packed groups of 8 (1 = present)
        n_groups = (n_rows + 7) // 8
        acc = 0
        for i, v in enumerate(values):
            if v is not None:
                acc |= 1 << i
        levels = bytearray()
        _t_uvarint(levels, (n_groups << 1) | 1)
        levels += acc.to_bytes(n_groups, "little")
        body += struct.pack("<I", len(levels)) + levels
        body += _plain_encode(present, typ)
        raw = bytes(body)
        comp = compress(raw)
        dph = _t_struct([
            (1, _T_I32, n_rows),   # num_values incl. nulls
            (2, _T_I32, _PLAIN),   # encoding
            (3, _T_I32, _RLE),     # definition_level_encoding
            (4, _T_I32, _RLE),     # repetition_level_encoding
        ])
        header = _t_struct([
            (1, _T_I32, 0),          # DATA_PAGE
            (2, _T_I32, len(raw)),
            (3, _T_I32, len(comp)),
            (5, _T_STRUCT, dph),
        ])
        offset = len(out)
        out += header + comp
        md_fields = [
            (1, _T_I32, _WRITE_PHYS[typ]),
            (2, _T_LIST, (_T_I32, [_PLAIN, _RLE])),
            (3, _T_LIST, (_T_BINARY, [name.encode("utf-8")])),
            (4, _T_I32, codec_id),
            (5, _T_I64, n_rows),
            (6, _T_I64, len(header) + len(raw)),
            (7, _T_I64, len(header) + len(comp)),
            (9, _T_I64, offset),
        ]
        stat_vals = present
        if typ in ("float", "double"):
            # NaN compares false both ways, making Python min()/max()
            # order-dependent; the parquet reference writer drops NaN
            # from stats (and omits them entirely if all values are NaN)
            # so data skipping never prunes on a NaN-poisoned bound.
            stat_vals = [v for v in present if v == v]
        if stat_vals and typ in ("int32", "int64", "float", "double"):
            # Statistics: null_count(3), max_value(5), min_value(6) —
            # plain-encoded; these are what the engine's own
            # txlog_backfill_stats / data skipping consume
            lo = _plain_encode([min(stat_vals)], typ)
            hi = _plain_encode([max(stat_vals)], typ)
            md_fields.append((12, _T_STRUCT, _t_struct([
                (1, _T_BINARY, hi),  # legacy max (readers want both)
                (2, _T_BINARY, lo),  # legacy min
                (3, _T_I64, n_rows - len(present)),
                (5, _T_BINARY, hi),  # max_value
                (6, _T_BINARY, lo),  # min_value
            ])))
        md = _t_struct(md_fields)
        chunk_metas.append((offset, len(header) + len(comp), md))
    chunks = [
        _t_struct([(2, _T_I64, off), (3, _T_STRUCT, md)])
        for off, _sz, md in chunk_metas
    ]
    row_group = _t_struct([
        (1, _T_LIST, (_T_STRUCT, chunks)),
        (2, _T_I64, sum(sz for _o, sz, _m in chunk_metas)),
        (3, _T_I64, n_rows),
    ])
    schema = [_t_struct([
        (4, _T_BINARY, b"schema"),
        (5, _T_I32, len(names)),
    ])]
    for name in names:
        fields = [
            (1, _T_I32, _WRITE_PHYS[types[name]]),
            (3, _T_I32, 1),  # OPTIONAL
            (4, _T_BINARY, name.encode("utf-8")),
        ]
        if types[name] == "string":
            fields.append((6, _T_I32, 0))  # ConvertedType UTF8
        schema.append(_t_struct(fields))
    footer = _t_struct([
        (1, _T_I32, 1),  # format version
        (2, _T_LIST, (_T_STRUCT, schema)),
        (3, _T_I64, n_rows),
        (4, _T_LIST, (_T_STRUCT, [row_group])),
        (6, _T_BINARY, b"ncd-spark native writer"),
    ])
    out += footer
    out += struct.pack("<I", len(footer)) + b"PAR1"
    return bytes(out)
