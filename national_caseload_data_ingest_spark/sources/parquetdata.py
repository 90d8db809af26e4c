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
  pages, raw-length-given in v2 — multi-bit definition levels and
  repetition levels included: STRUCT (dicts), the standard 3-level
  LIST (lists), and the standard MAP (dicts) reconstruct at ANY
  nesting depth and combination via full Dremel record assembly
  (Melnik et al., VLDB 2010 §4); legacy pre-standard layouts — bare
  repeated fields (incl. bare repeated groups = lists of required
  structs), 2-level lists (repeated primitive / "array" / "*_tuple" /
  multi-field group directly under a LIST group), and outer map
  groups annotated MAP_KEY_VALUE instead of MAP (the hoisted legacy
  form) — decode per the LogicalTypes.md backward-compatibility
  rules;
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
    """Top-level FLAT leaves: name → {phys, optional, type_length,
    utf8}.  Nested top-level columns are skipped (read those via
    :func:`read_table_native`); a file mixing flat and nested columns
    still serves its flat ones here."""
    out: dict[str, dict] = {}
    for node in _schema_nodes(fm):
        if node["children"] is not None or node["repeated"]:
            # nested (or legacy bare-repeated, i.e. an implicit list)
            # column — read_table_native territory
            continue
        out[node["name"]] = {
            "phys": node["phys"],
            "optional": node["optional"],
            "type_length": node["type_length"],
            "utf8": node["utf8"],
        }
    return out


def _read_chunk_levels(
    data: bytes, md: dict, leaf: dict
) -> tuple[list[int] | None, list[int] | None, list]:
    """One column chunk → ``(def_levels, rep_levels, present_values)``.

    ``def_levels``/``rep_levels`` are full-length level streams (None
    when the leaf's max level is 0); ``present_values`` holds only the
    values whose definition level equals ``max_def`` — the caller
    assembles nulls / lists / structs from the levels."""
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
    max_def = leaf.get("max_def", 1 if leaf["optional"] else 0)
    max_rep = leaf.get("max_rep", 0)
    def_w = max_def.bit_length()
    rep_w = max_rep.bit_length()
    defs: list[int] | None = [] if max_def else None
    reps: list[int] | None = [] if max_rep else None
    vals: list = []
    n_levels = 0
    while n_levels < n_values:
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
            if max_rep:
                if dph.get(4, _RLE) != _RLE:
                    raise NotImplementedError(
                        "parquet: non-RLE repetition levels")
                ln = struct.unpack_from("<I", raw, pos)[0]
                pos += 4
                page_reps, _ = _rle_bp_hybrid(raw, pos, rep_w, nv)
                pos += ln
                reps += page_reps
            page_defs = None
            if max_def:
                if dph.get(3, _RLE) != _RLE:
                    raise NotImplementedError(
                        "parquet: non-RLE definition levels")
                ln = struct.unpack_from("<I", raw, pos)[0]
                pos += 4
                page_defs, _ = _rle_bp_hybrid(raw, pos, def_w, nv)
                pos += ln
                defs += page_defs
            vals += _decode_values(raw, pos, enc, phys, tl, nv,
                                   page_defs, dictionary, max_def)
        elif ptype == 3:  # data page v2
            dph = hdr.get(8, {})
            nv = dph.get(1, 0)
            n_nulls = dph.get(2, 0)
            enc = dph.get(4, 0)
            dl_len = dph.get(5, 0)
            rl_len = dph.get(6, 0)
            is_comp = dph.get(7, True)
            if max_rep:
                page_reps, _ = _rle_bp_hybrid(payload, 0, rep_w, nv)
                reps += page_reps
            elif rl_len:
                raise ValueError(
                    "parquet: repetition levels on a non-repeated leaf")
            page_defs = None
            if max_def:
                page_defs, _ = _rle_bp_hybrid(payload, rl_len, def_w, nv)
                defs += page_defs
            body = payload[rl_len + dl_len:]
            raw = _decompress(codec, body, unc_size - rl_len - dl_len) \
                if is_comp else body
            del n_nulls
            vals += _decode_values(raw, 0, enc, phys, tl, nv,
                                   page_defs, dictionary, max_def)
        else:
            raise NotImplementedError(f"parquet: page type {ptype}")
        n_levels += nv
    return defs, reps, vals


def _read_chunk(data: bytes, md: dict, leaf: dict) -> list:
    """One FLAT column chunk → python values (None where the definition
    level says null)."""
    defs, _reps, vals = _read_chunk_levels(data, md, leaf)
    if defs is None:
        return vals
    it = iter(vals)
    return [next(it) if d else None for d in defs]


def _decode_values(raw: bytes, pos: int, enc: int, phys: int, tl: int,
                   nv: int, levels: list[int] | None,
                   dictionary: list | None, max_def: int = 1) -> list:
    """Decode the PRESENT values of one data page (a value exists only
    where the definition level reaches ``max_def``)."""
    n_present = (nv if levels is None
                 else sum(1 for d in levels if d == max_def))
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
    return vals


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
        if any(n["name"] == name and n["children"] is not None
               for n in _schema_nodes(fm)):
            raise ValueError(
                f"parquet: column {name!r} is nested — use "
                "read_table_native")
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


# --- nested schemas (one level of LIST / STRUCT) ----------------------------

def _schema_nodes(fm: dict) -> list[dict]:
    """Top-level schema nodes from the footer's flattened element list.
    Each node: {name, optional, repeated, phys, type_length, utf8,
    converted, logical, children} — children resolved by the
    num_children walk (depth-first preorder, the thrift layout)."""
    elems = fm.get(2, [])
    if not elems:
        raise ValueError("parquet: empty schema")

    pos = 1

    def walk() -> dict:
        nonlocal pos
        el = elems[pos]
        pos += 1
        logical = el.get(10, {})
        node = {
            "name": el.get(4, b"").decode("utf-8"),
            "optional": el.get(3, 0) == 1,
            "repeated": el.get(3, 0) == 2,
            "phys": el.get(1),
            "type_length": el.get(2, 0),
            "utf8": el.get(1) == 6 and (el.get(6) == 0 or 1 in logical),
            "converted": el.get(6),
            "logical": logical,
            "children": None,
        }
        n_children = el.get(5, 0)
        if n_children:
            node["children"] = [walk() for _ in range(n_children)]
        return node

    out = []
    n_top = elems[0].get(5, 0)
    for _ in range(n_top):
        out.append(walk())
    if pos != len(elems):
        raise ValueError("parquet: schema element count mismatch")
    return out


def _is_list(node: dict) -> bool:
    return node["converted"] == 3 or 3 in node["logical"]


def _is_map(node: dict) -> bool:
    # ConvertedType MAP = 1 (the outer group) / MAP_KEY_VALUE = 2
    # (legacy middle group annotation some writers hoist); LogicalType
    # union field 2 = MapType.
    return node["converted"] in (1, 2) or 2 in node["logical"]


def _leaf_spec(node: dict, extra_def: int, extra_rep: int) -> dict:
    """The per-leaf dict ``_read_chunk_levels`` consumes, with the
    ancestors' contribution to the level depths folded in."""
    return {
        "phys": node["phys"],
        "optional": node["optional"],
        "type_length": node["type_length"],
        "utf8": node["utf8"],
        "max_def": extra_def + (1 if node["optional"] else 0),
        "max_rep": extra_rep,
    }


def _column_levels(
    data: bytes, fm: dict, path: list[str], leaf: dict
) -> tuple[list[int] | None, list[int] | None, list]:
    """Concatenated (defs, reps, present values) for one leaf path
    across every row group, in row order."""
    defs: list[int] | None = [] if leaf["max_def"] else None
    reps: list[int] | None = [] if leaf["max_rep"] else None
    vals: list = []
    found = False
    for rg in fm.get(4, []):
        for chunk in rg.get(1, []):
            md = chunk.get(3)
            if md is None:
                raise ValueError("parquet: chunk without metadata")
            if [p.decode("utf-8") for p in md.get(3, [])] != path:
                continue
            found = True
            d, r, v = _read_chunk_levels(data, md, leaf)
            if defs is not None:
                defs += d
            if reps is not None:
                reps += r
            vals += v
    if not found and fm.get(4):
        raise ValueError(f"parquet: no chunks for column {path!r}")
    if leaf["utf8"]:
        vals = [v.decode("utf-8") for v in vals]
    return defs, reps, vals


def _weave_nulls(defs: list[int] | None, vals: list, max_def: int) -> list:
    if defs is None:
        return vals
    it = iter(vals)
    return [next(it) if d == max_def else None for d in defs]


def _node_spec(node: dict, base_def: int, t_reps: list[int],
               path: list[str]) -> dict:
    """Recursive read-spec for one schema subtree: per-node definition
    thresholds, repeated-ancestor thresholds, and leaf stream info —
    the compile step of Dremel record assembly (Melnik et al., VLDB
    2010 §4).  Kinds: scalar / struct / list (annotated 3-level) /
    map (annotated key_value)."""
    my_path = path + [node["name"]]
    if node["repeated"]:
        # Legacy pre-standard layouts: a repeated field with no
        # LIST-annotated wrapper group (parquet-mr "2-level" lists and
        # bare repeated fields; parquet-format LogicalTypes.md
        # backward-compatibility rules).  The repeated node itself IS
        # the element — required, never null — and the list itself
        # cannot be null: def == base_def means empty list.  A bare
        # repeated GROUP is a list of required structs, per the
        # "repeated group with multiple fields" rule.
        t_r = base_def + 1
        elem_node = {**node, "repeated": False, "optional": False}
        elem = _node_spec(elem_node, t_r, t_reps + [t_r], path)
        return {"kind": "list", "t_empty": base_def, "elem": elem}
    if node["children"] is None:
        leaf = _leaf_spec(node, extra_def=base_def,
                          extra_rep=len(t_reps))
        return {"kind": "scalar", "t": leaf["max_def"], "leaf": leaf,
                "path": my_path, "t_reps": list(t_reps)}
    if _is_list(node):
        mids = node["children"]
        if len(mids) != 1 or not mids[0]["repeated"]:
            raise NotImplementedError(
                "parquet: LIST group must contain exactly one repeated "
                "field")
        rep = mids[0]
        t_o = base_def + (1 if node["optional"] else 0)
        t_r = t_o + 1
        # Legacy 2-level inside an annotated LIST group: the repeated
        # child is the element itself (required) when it is a
        # primitive, a multi-field group, or a group named "array" /
        # "<list name>_tuple" (LogicalTypes.md backward-compat rules);
        # otherwise it is the standard 3-level middle group.
        if rep["children"] is None or len(rep["children"]) != 1 \
                or rep["name"] in ("array", node["name"] + "_tuple"):
            elem_node = {**rep, "repeated": False, "optional": False}
            elem = _node_spec(elem_node, t_r, t_reps + [t_r], my_path)
            return {"kind": "list", "t_empty": t_o, "elem": elem}
        elem = _node_spec(rep["children"][0], t_r,
                          t_reps + [t_r], my_path + [rep["name"]])
        return {"kind": "list", "t_empty": t_o, "elem": elem}
    if _is_map(node):
        mids = node["children"]
        if len(mids) != 1 or not mids[0]["repeated"] \
                or mids[0]["children"] is None \
                or len(mids[0]["children"]) != 2:
            raise NotImplementedError(
                "parquet: only the standard MAP key_value layout is "
                "supported")
        knode, vnode = mids[0]["children"]
        if knode["optional"] or knode["children"] is not None:
            raise ValueError("parquet: MAP keys must be required scalars")
        t_o = base_def + (1 if node["optional"] else 0)
        t_r = t_o + 1
        kv_path = my_path + [mids[0]["name"]]
        return {"kind": "map", "t_empty": t_o,
                "key": _node_spec(knode, t_r, t_reps + [t_r], kv_path),
                "val": _node_spec(vnode, t_r, t_reps + [t_r], kv_path)}
    t = base_def + (1 if node["optional"] else 0)
    return {"kind": "struct", "t": t, "optional": node["optional"],
            "fields": [(c["name"], _node_spec(c, t, t_reps, my_path))
                       for c in node["children"]]}


def _collect_leaves(spec: dict, out: list[dict]) -> list[int]:
    """Depth-first leaf collection; assigns each scalar spec its leaf
    id and returns the subtree's id list (stored on group specs for
    the merge step)."""
    kind = spec["kind"]
    if kind == "scalar":
        spec["id"] = len(out)
        out.append(spec)
        return [spec["id"]]
    if kind == "list":
        spec["ids"] = _collect_leaves(spec["elem"], out)
        return spec["ids"]
    if kind == "map":
        spec["key_ids"] = _collect_leaves(spec["key"], out)
        spec["val_ids"] = _collect_leaves(spec["val"], out)
        spec["ids"] = spec["key_ids"] + spec["val_ids"]
        return spec["ids"]
    ids: list[int] = []
    for _name, child in spec["fields"]:
        child_ids = _collect_leaves(child, out)
        ids += child_ids
    spec["ids"] = ids
    return ids


def _assemble_leaf(defs: list[int], reps: list[int], vals: list,
                   t_reps: list[int], max_def: int) -> list:
    """One leaf's (def, rep, value) stream → per-row token trees.

    A token tree mirrors the leaf path's REPEATED structure only:
    python lists at each repeated ancestor, and at the bottom either a
    ``(d, value)`` pair (all repeated ancestors opened) or a bare
    ``int`` definition level (the walk stopped at a null/empty point
    above the next repeated ancestor).  Structs don't nest tokens —
    their nullness is read off ``d`` during the merge."""
    rows: list = []
    it = iter(vals)
    open_lists: list[list] = []
    m = len(t_reps)
    for d, r in zip(defs, reps):
        v = next(it) if d == max_def else None
        if r == 0:
            open_lists = []
            parent = None
        else:
            if r > len(open_lists):
                raise ValueError(
                    f"parquet: repetition level {r} exceeds open list "
                    f"depth {len(open_lists)} (corrupt page)")
            del open_lists[r:]
            parent = open_lists[-1]
        i = len(open_lists)
        while i < m and d >= t_reps[i]:
            new: list = []
            if parent is None:
                rows.append(new)
            else:
                parent.append(new)
            open_lists.append(new)
            parent = new
            i += 1
        token = (d, v) if i == m else d
        if parent is None:
            rows.append(token)
        else:
            parent.append(token)
    return rows


def _tok_def(tok) -> int | None:
    """Definition level carried by a token (None = a list opened here,
    so everything at this level is defined)."""
    if isinstance(tok, list):
        return None
    if isinstance(tok, tuple):
        return tok[0]
    return tok


def _merge_tokens(spec: dict, toks: dict):
    """Zip sibling leaf token trees back into one python value —
    the assembly step of Dremel record reconstruction."""
    kind = spec["kind"]
    if kind == "scalar":
        d, v = toks[spec["id"]]
        return v if d == spec["t"] else None
    if kind == "struct":
        d = _tok_def(toks[spec["ids"][0]])
        is_null = d is not None and d < spec["t"]
        # Sibling leaves must agree on struct nullness — a corrupt file
        # where one leaf says "struct is null" and another carries data
        # would otherwise decode silently wrong.
        for other_id in spec["ids"][1:]:
            od = _tok_def(toks[other_id])
            if (od is not None and od < spec["t"]) != is_null:
                raise ValueError(
                    "parquet: sibling leaves disagree on struct nullness "
                    f"(def levels {d} vs {od} at threshold {spec['t']})")
        if is_null:
            return None
        return {name: _merge_tokens(child,
                                    {i: toks[i] for i in child["ids"]}
                                    if child["kind"] != "scalar"
                                    else {child["id"]: toks[child["id"]]})
                for name, child in spec["fields"]}
    rep_tok = toks[spec["ids"][0]]
    if not isinstance(rep_tok, list):
        d = _tok_def(rep_tok)
        if d is not None and d >= spec["t_empty"]:
            return {} if kind == "map" else []
        return None
    n = len(rep_tok)
    if kind == "list":
        elem = spec["elem"]
        return [_merge_tokens(elem, {i: toks[i][j] for i in spec["ids"]})
                for j in range(n)]
    out = {}
    for j in range(n):
        k = _merge_tokens(spec["key"],
                          {i: toks[i][j] for i in spec["key_ids"]})
        out[k] = _merge_tokens(spec["val"],
                               {i: toks[i][j] for i in spec["val_ids"]})
    return out


def _read_nested(data: bytes, fm: dict, node: dict) -> list:
    """One nested top-level column → per-row python values, at ANY
    nesting depth (lists of structs, structs of lists, maps of lists,
    …): full Dremel record assembly over every leaf under the node."""
    spec = _node_spec(node, 0, [], [])
    leaves: list[dict] = []
    _collect_leaves(spec, leaves)
    per_leaf: list[list] = []
    n_rows: int | None = None
    for lf in leaves:
        defs, reps, vals = _column_levels(data, fm, lf["path"],
                                          lf["leaf"])
        if defs is None:
            defs = [lf["leaf"]["max_def"]] * len(vals)
        if reps is None:
            reps = [0] * len(defs)
        rows = _assemble_leaf(defs, reps, vals, lf["t_reps"],
                              lf["leaf"]["max_def"])
        if n_rows is None:
            n_rows = len(rows)
        elif n_rows != len(rows):
            raise ValueError(
                "parquet: sibling leaves disagree on row count")
        per_leaf.append(rows)
    if spec["kind"] == "scalar":
        return [tok[1] if tok[0] == spec["t"] else None
                for tok in per_leaf[0]]
    return [_merge_tokens(spec,
                          {i: per_leaf[i][r] for i in range(len(leaves))})
            for r in range(n_rows or 0)]


def read_table_native(data: bytes) -> dict[str, list]:
    """Every column → python values; the native-read twin of a full
    scan.  Flat scalars read the direct path; nested columns (LIST /
    STRUCT / MAP at any depth and combination) reconstruct via Dremel
    record assembly (``_read_nested``)."""
    fm = read_footer(data)
    out: dict[str, list] = {}
    for node in _schema_nodes(fm):
        if node["children"] is None and not node["repeated"]:
            leaf = _leaf_spec(node, 0, 0)
            defs, _r, vals = _column_levels(
                data, fm, [node["name"]], leaf)
            out[node["name"]] = _weave_nulls(defs, vals, leaf["max_def"])
        else:
            out[node["name"]] = _read_nested(data, fm, node)
    return out


# --- native WRITER -----------------------------------------------------------

_T_BOOL = 1  # compact protocol: the bool VALUE lives in the type nibble
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
        wire_tt = tt
        if tt == _T_BOOL:  # 1 = BOOL_TRUE, 2 = BOOL_FALSE, no payload
            wire_tt = 1 if v else 2
        delta = fid - prev
        if 1 <= delta <= 15:
            out.append((delta << 4) | wire_tt)
        else:
            out.append(wire_tt)
            _t_zigzag(out, fid)
        prev = fid
        if tt == _T_BOOL:
            continue
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


_STAT_TRUNC = 64  # byte-array statistics truncation (reference-writer size)


def _trunc_upper(b: bytes) -> bytes | None:
    """A ≤64-byte value GUARANTEED >= ``b``: truncate and increment the
    last non-0xFF byte (None when all bytes are 0xFF — omit the max)."""
    t = bytearray(b[:_STAT_TRUNC])
    for i in range(len(t) - 1, -1, -1):
        if t[i] != 0xFF:
            t[i] += 1
            return bytes(t[: i + 1])
    return None


def _stats_struct(present: list, typ: str, n_nulls: int) -> bytes | None:
    """The Statistics struct for one chunk: null_count(3), v2
    min_value(6)/max_value(5) with exactness flags, legacy min/max(2/1)
    only when exact.  NaN is dropped from float/double bounds (min/max
    would be order-dependent); long byte-array bounds are truncated —
    min to a prefix (a valid lower bound), max via ``_trunc_upper``."""
    stat_vals = present
    if typ in ("float", "double"):
        stat_vals = [v for v in present if v == v]
    if not stat_vals:
        return None
    fields: list[tuple] = []
    if typ in ("int32", "int64", "float", "double"):
        lo = _plain_encode([min(stat_vals)], typ)
        hi = _plain_encode([max(stat_vals)], typ)
        fields = [(1, _T_BINARY, hi), (2, _T_BINARY, lo),
                  (3, _T_I64, n_nulls),
                  (5, _T_BINARY, hi), (6, _T_BINARY, lo)]
    elif typ in ("string", "binary"):
        bs = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
              for v in stat_vals]
        mn, mx = min(bs), max(bs)
        lo, lo_exact = ((mn, True) if len(mn) <= _STAT_TRUNC
                        else (mn[:_STAT_TRUNC], False))
        hi, hi_exact = ((mx, True) if len(mx) <= _STAT_TRUNC
                        else (_trunc_upper(mx), False))
        if lo_exact and hi_exact:
            fields += [(1, _T_BINARY, hi), (2, _T_BINARY, lo)]
        fields.append((3, _T_I64, n_nulls))
        if hi is not None:
            fields.append((5, _T_BINARY, hi))
        fields.append((6, _T_BINARY, lo))
        if hi is not None:
            fields.append((7, _T_BOOL, hi_exact))
        fields.append((8, _T_BOOL, lo_exact))
    else:
        return None
    return _t_struct(fields)


def _bp_encode(idx: list[int], width: int) -> bytes:
    """RLE/bit-packed hybrid, bit-packed form only: LSB-first groups of
    8 values (zero-padded), the encoding the dictionary indices use."""
    out = bytearray()
    n_groups = (len(idx) + 7) // 8
    _t_uvarint(out, (n_groups << 1) | 1)
    acc = 0
    for i, v in enumerate(idx):
        acc |= v << (i * width)
    out += acc.to_bytes(n_groups * width, "little")
    return bytes(out)


def _split_type_args(s: str) -> list[str]:
    """Bracket-aware top-level comma split for the type DSL."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _parse_write_type(t: str):
    """The writer's RECURSIVE type DSL: a scalar name, ``list<T>``,
    ``struct<name:T,...>``, or ``map<K,V>`` where T/V are themselves
    any DSL type and K is a scalar — the writer twin of the reader's
    any-depth Dremel assembly."""
    t = t.strip()
    if t.startswith("list<") and t.endswith(">"):
        return ("list", _parse_write_type(t[5:-1]))
    if t.startswith("struct<") and t.endswith(">"):
        fields = []
        for part in _split_type_args(t[7:-1]):
            fname, _, ftyp = part.partition(":")
            fields.append((fname.strip(), _parse_write_type(ftyp)))
        if not fields:
            raise ValueError("parquet writer: empty struct type")
        return ("struct", fields)
    if t.startswith("map<") and t.endswith(">"):
        args = _split_type_args(t[4:-1])
        if len(args) != 2:
            raise ValueError(f"parquet writer: map needs 2 args: {t!r}")
        kp = _parse_write_type(args[0])
        if kp[0] != "scalar":
            raise NotImplementedError(
                "parquet writer: map keys must be scalar")
        return ("map", kp[1], _parse_write_type(args[1]))
    if t not in _WRITE_PHYS:
        raise NotImplementedError(f"parquet writer: type {t!r}")
    return ("scalar", t)


def _write_spec(parsed, base_def: int, n_rep: int, path: list[str],
                leaves: list[dict], required: bool = False) -> dict:
    """Recursive write-spec: definition thresholds + leaf registry,
    mirroring the reader's ``_node_spec``.  Every written field is
    OPTIONAL except map keys (``required=True``)."""
    kind = parsed[0]
    bump = 0 if required else 1
    if kind == "scalar":
        spec = {"kind": "scalar", "t": base_def + bump,
                "typ": parsed[1], "id": len(leaves),
                "path": path, "max_rep": n_rep}
        leaves.append(spec)
        spec["ids"] = [spec["id"]]
        return spec
    if kind == "list":
        t_o = base_def + bump
        t_r = t_o + 1
        elem = _write_spec(parsed[1], t_r, n_rep + 1,
                           path + ["list", "element"], leaves)
        return {"kind": "list", "t": t_o, "t_rep": t_r,
                "rep_depth": n_rep + 1, "elem": elem,
                "ids": elem["ids"]}
    if kind == "map":
        t_o = base_def + bump
        t_r = t_o + 1
        key = _write_spec(("scalar", parsed[1]), t_r, n_rep + 1,
                          path + ["key_value", "key"], leaves,
                          required=True)
        val = _write_spec(parsed[2], t_r, n_rep + 1,
                          path + ["key_value", "value"], leaves)
        return {"kind": "map", "t": t_o, "t_rep": t_r,
                "rep_depth": n_rep + 1, "key": key, "val": val,
                "ids": key["ids"] + val["ids"]}
    t = base_def + bump
    fields = [(fname, _write_spec(fp, t, n_rep, path + [fname], leaves))
              for fname, fp in parsed[1]]
    return {"kind": "struct", "t": t, "fields": fields,
            "ids": [i for _n, f in fields for i in f["ids"]]}


def _shred_null(spec: dict, d: int, rep: int, out: list[dict]) -> None:
    for i in spec["ids"]:
        out[i]["defs"].append(d)
        out[i]["reps"].append(rep)


def _shred_value(spec: dict, value, d_parent: int, rep: int,
                 out: list[dict]) -> None:
    """Dremel record shredding: walk one value tree, emitting one
    (def, rep[, value]) slot stream per leaf."""
    kind = spec["kind"]
    if kind == "scalar":
        lf = out[spec["id"]]
        if value is None:
            lf["defs"].append(d_parent)
        else:
            lf["defs"].append(spec["t"])
            lf["present"].append(value)
        lf["reps"].append(rep)
        return
    if value is None:
        _shred_null(spec, d_parent, rep, out)
        return
    if kind == "struct":
        for fname, child in spec["fields"]:
            _shred_value(child, value.get(fname), spec["t"], rep, out)
        return
    if len(value) == 0:
        _shred_null(spec, spec["t"], rep, out)
        return
    if kind == "list":
        for j, elem in enumerate(value):
            _shred_value(spec["elem"], elem, spec["t_rep"],
                         rep if j == 0 else spec["rep_depth"], out)
        return
    for j, (k, v) in enumerate(value.items()):
        r = rep if j == 0 else spec["rep_depth"]
        if k is None:
            raise ValueError("parquet writer: map keys must not be None")
        _shred_value(spec["key"], k, spec["t_rep"], r, out)
        _shred_value(spec["val"], v, spec["t_rep"], r, out)


def _nested_leaf_streams(name: str, parsed, values: list) -> list[dict]:
    """Per-leaf write streams for one (possibly nested) column: dicts
    of {path, typ, defs, reps, present, max_def, max_rep} — general
    Dremel shredding at any nesting depth."""
    leaves: list[dict] = []
    spec = _write_spec(parsed, 0, 0, [name], leaves)
    out = [{"defs": [], "reps": [], "present": []} for _ in leaves]
    for row in values:
        _shred_value(spec, row, 0, 0, out)
    streams = []
    for lf, st in zip(leaves, out):
        streams.append({
            "path": lf["path"], "typ": lf["typ"], "defs": st["defs"],
            "reps": st["reps"] if lf["max_rep"] else None,
            "present": st["present"], "max_def": lf["t"],
            "max_rep": lf["max_rep"],
        })
    return streams


def _schema_elements_for(name: str, parsed,
                         repetition: int = 1) -> list[bytes]:
    """Footer schema elements (thrift structs) for one column subtree,
    depth-first preorder, any nesting depth."""
    def elem(fname, rep, phys=None, n_children=None, converted=None,
             logical=None):
        fields = []
        if phys is not None:
            fields.append((1, _T_I32, phys))
        fields.append((3, _T_I32, rep))
        fields.append((4, _T_BINARY, fname.encode("utf-8")))
        if n_children is not None:
            fields.append((5, _T_I32, n_children))
        if converted is not None:
            fields.append((6, _T_I32, converted))
        if logical is not None:
            fields.append((10, _T_STRUCT, logical))
        return _t_struct(fields)

    kind = parsed[0]
    if kind == "scalar":
        typ = parsed[1]
        conv = 0 if typ == "string" else None
        logi = (_t_struct([(1, _T_STRUCT, _t_struct([]))])
                if typ == "string" else None)
        return [elem(name, repetition, phys=_WRITE_PHYS[typ],
                     converted=conv, logical=logi)]
    if kind == "list":
        logi = _t_struct([(3, _T_STRUCT, _t_struct([]))])
        return ([elem(name, repetition, n_children=1, converted=3,
                      logical=logi),
                 elem("list", 2, n_children=1)]
                + _schema_elements_for("element", parsed[1]))
    if kind == "struct":
        out = [elem(name, repetition, n_children=len(parsed[1]))]
        for fname, fp in parsed[1]:
            out += _schema_elements_for(fname, fp)
        return out
    logi = _t_struct([(2, _T_STRUCT, _t_struct([]))])
    return ([elem(name, repetition, n_children=1, converted=1,
                  logical=logi),
             elem("key_value", 2, n_children=2)]
            + _schema_elements_for("key", ("scalar", parsed[1]),
                                   repetition=0)
            + _schema_elements_for("value", parsed[2]))


def write_parquet(cols: dict[str, list], types: dict[str, str],
                  codec: str = "snappy",
                  use_dictionary: bool | str = "auto",
                  row_group_size: int | None = None,
                  data_page_version: int = 1) -> bytes:
    """Native parquet WRITER (the reader's twin): v1 or v2 data pages
    with RLE/bit-packed definition+repetition levels, thrift-compact
    page headers and footer, MULTIPLE row groups
    (``row_group_size``, default one group) — pages compressed by the
    repo's OWN snappy/zstd encoders (or zlib gzip / stored; v2 pages
    compress only the value section and carry level byte lengths in
    the header).  Nested columns shred recursively
    (``_nested_leaf_streams``); low-cardinality flat columns get a
    PLAIN dictionary page + PLAIN_DICTIONARY bit-packed index pages
    (``use_dictionary``: True / False / "auto" = encode when distinct
    ≤ half the values and ≤ 2^16); per-row-group statistics cover the
    numeric types AND byte arrays (truncated bounds past 64 bytes) —
    what footer_summary/txlog row-group skipping consumes.
    Validated by pyarrow reading the output byte-for-byte."""
    codec_id = _WRITE_CODECS[codec]
    if data_page_version not in (1, 2):
        raise ValueError("parquet writer: data_page_version must be 1 or 2")

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
    for name in names:
        if len(cols[name]) != n_rows:
            raise ValueError("parquet: ragged columns")
    parsed_types = {name: _parse_write_type(types[name])
                    for name in names}
    rg_size = row_group_size if row_group_size and row_group_size > 0 \
        else max(n_rows, 1)
    starts = list(range(0, n_rows, rg_size)) or [0]
    out = bytearray(b"PAR1")
    row_groups = []
    for start in starts:
        rows_here = min(rg_size, n_rows - start) if n_rows else 0
        chunk_metas = []
        for name in names:
            parsed = parsed_types[name]
            sliced = cols[name][start : start + rg_size]
            for leaf in _nested_leaf_streams(name, parsed, sliced):
                chunk_metas.append(_write_chunk(
                    out, leaf, parsed[0] == "scalar", codec_id,
                    compress, use_dictionary, data_page_version))
        chunks = [
            _t_struct([(2, _T_I64, off), (3, _T_STRUCT, md)])
            for off, _sz, md in chunk_metas
        ]
        row_groups.append(_t_struct([
            (1, _T_LIST, (_T_STRUCT, chunks)),
            (2, _T_I64, sum(sz for _o, sz, _m in chunk_metas)),
            (3, _T_I64, rows_here),
        ]))
    schema = [_t_struct([
        (4, _T_BINARY, b"schema"),
        (5, _T_I32, len(names)),
    ])]
    for name in names:
        schema += _schema_elements_for(name, parsed_types[name])
    footer = _t_struct([
        (1, _T_I32, 1),  # format version
        (2, _T_LIST, (_T_STRUCT, schema)),
        (3, _T_I64, n_rows),
        (4, _T_LIST, (_T_STRUCT, row_groups)),
        (6, _T_BINARY, b"ncd-spark native writer"),
    ])
    out += footer
    out += struct.pack("<I", len(footer)) + b"PAR1"
    return bytes(out)


def _write_chunk(out: bytearray, leaf: dict, is_flat: bool,
                 codec_id: int, compress, use_dictionary,
                 data_page_version: int) -> tuple[int, int, bytes]:
    """Write one leaf's column chunk (optional dictionary page + one
    data page) into ``out``; returns (offset, compressed_size,
    ColumnMetaData thrift bytes)."""
    typ = leaf["typ"]
    present = leaf["present"]
    defs = leaf["defs"]
    n_slots = len(defs)

    # level streams (RLE/bit-packed hybrid at true bit widths)
    rbytes = b""
    if leaf["max_rep"]:
        rwidth = max(1, leaf["max_rep"].bit_length())
        rbytes = _bp_encode(leaf["reps"], rwidth)
    dwidth = max(1, leaf["max_def"].bit_length())
    dbytes = _bp_encode(defs, dwidth)

    # dictionary routing (flat scalar leaves): worth it when the
    # dictionary is much smaller than the data; float/double with
    # NaN stay PLAIN (NaN != NaN breaks dict-key dedup)
    distinct: list | None = None
    if is_flat and (use_dictionary is True or use_dictionary == "auto"):
        hashable = not (typ in ("float", "double")
                        and any(v != v for v in present))
        if typ != "boolean" and hashable and present:
            uniq = list(dict.fromkeys(present))
            if use_dictionary is True or (
                len(uniq) <= 65536 and 2 * len(uniq) <= len(present)
            ):
                distinct = uniq

    offset = len(out)
    total_raw = total_comp = 0
    dict_offset = None
    if distinct is not None:
        draw = _plain_encode(distinct, typ)
        dcomp = compress(draw)
        dhdr = _t_struct([
            (1, _T_I32, 2),  # DICTIONARY_PAGE
            (2, _T_I32, len(draw)),
            (3, _T_I32, len(dcomp)),
            (7, _T_STRUCT, _t_struct([
                (1, _T_I32, len(distinct)),
                (2, _T_I32, _PLAIN_DICT),
            ])),
        ])
        dict_offset = len(out)
        out += dhdr + dcomp
        total_raw += len(dhdr) + len(draw)
        total_comp += len(dhdr) + len(dcomp)
        index = {v: i for i, v in enumerate(distinct)}
        width = max((len(distinct) - 1).bit_length(), 1)
        vals_raw = bytes([width]) + _bp_encode(
            [index[v] for v in present], width)
        enc = _PLAIN_DICT
    else:
        vals_raw = _plain_encode(present, typ)
        enc = _PLAIN

    data_offset = len(out)
    if data_page_version == 1:
        body = bytearray()
        if rbytes:
            body += struct.pack("<I", len(rbytes)) + rbytes
        body += struct.pack("<I", len(dbytes)) + dbytes
        body += vals_raw
        raw = bytes(body)
        comp = compress(raw)
        dph = _t_struct([
            (1, _T_I32, n_slots),  # num_values: every (def, rep) slot
            (2, _T_I32, enc),      # encoding
            (3, _T_I32, _RLE),     # definition_level_encoding
            (4, _T_I32, _RLE),     # repetition_level_encoding
        ])
        header = _t_struct([
            (1, _T_I32, 0),          # DATA_PAGE
            (2, _T_I32, len(raw)),
            (3, _T_I32, len(comp)),
            (5, _T_STRUCT, dph),
        ])
        out += header + comp
        total_raw += len(header) + len(raw)
        total_comp += len(header) + len(comp)
    else:
        # v2: levels ride UNCOMPRESSED before the (compressed) values,
        # with their byte lengths in the page header
        vals_comp = compress(vals_raw)
        n_nulls = sum(1 for d in defs if d < leaf["max_def"])
        n_page_rows = (leaf["reps"].count(0) if leaf["max_rep"]
                       else n_slots)
        dph2 = _t_struct([
            (1, _T_I32, n_slots),
            (2, _T_I32, n_nulls),
            (3, _T_I32, n_page_rows),
            (4, _T_I32, enc),
            (5, _T_I32, len(dbytes)),
            (6, _T_I32, len(rbytes)),
            (7, _T_BOOL, codec_id != 0),
        ])
        raw_sz = len(rbytes) + len(dbytes) + len(vals_raw)
        comp_sz = len(rbytes) + len(dbytes) + len(vals_comp)
        header = _t_struct([
            (1, _T_I32, 3),  # DATA_PAGE_V2
            (2, _T_I32, raw_sz),
            (3, _T_I32, comp_sz),
            (8, _T_STRUCT, dph2),
        ])
        out += header + rbytes + dbytes + vals_comp
        total_raw += len(header) + raw_sz
        total_comp += len(header) + comp_sz

    md_fields = [
        (1, _T_I32, _WRITE_PHYS[typ]),
        (2, _T_LIST, (_T_I32, [enc, _RLE])),
        (3, _T_LIST, (_T_BINARY,
                      [p.encode("utf-8") for p in leaf["path"]])),
        (4, _T_I32, codec_id),
        (5, _T_I64, n_slots),
        (6, _T_I64, total_raw),
        (7, _T_I64, total_comp),
        (9, _T_I64, data_offset),
    ]
    if dict_offset is not None:
        md_fields.append((11, _T_I64, dict_offset))
    # Statistics: these are what the engine's own
    # txlog_backfill_stats / footer_summary data skipping consume
    if is_flat:
        st = _stats_struct(present, typ, n_slots - len(present))
        if st is not None:
            md_fields.append((12, _T_STRUCT, st))
    md_fields.sort()
    return (offset, total_comp, _t_struct(md_fields))


# --- LEGACY-layout writer (fixture path) -------------------------------------

def _legacy_elem(fname: str, rep: int, phys: int | None = None,
                 n_children: int | None = None,
                 converted: int | None = None,
                 logical: bytes | None = None) -> bytes:
    fields: list[tuple[int, int, object]] = []
    if phys is not None:
        fields.append((1, _T_I32, phys))
    fields.append((3, _T_I32, rep))
    fields.append((4, _T_BINARY, fname.encode("utf-8")))
    if n_children is not None:
        fields.append((5, _T_I32, n_children))
    if converted is not None:
        fields.append((6, _T_I32, converted))
    if logical is not None:
        fields.append((10, _T_STRUCT, logical))
    return _t_struct(fields)


def _parse_legacy_type(t: str):
    """('scalar', typ) | ('bare', typ) | ('two_level', typ)
    | ('two_level_struct', [(name, typ), ...], wrapper_name)
    | ('legacy_map', ktyp, vtyp)."""
    t = t.strip()
    for kind in ("bare", "two_level_struct", "two_level", "legacy_map"):
        if t.startswith(kind + "<") and t.endswith(">"):
            inner = t[len(kind) + 1 : -1]
            if kind == "two_level_struct":
                wrapper = "array"
                if "|" in inner:
                    inner, wrapper = inner.rsplit("|", 1)
                fields = []
                for part in _split_type_args(inner):
                    fname, ftyp = part.split(":", 1)
                    if ftyp.strip() not in _WRITE_PHYS:
                        raise ValueError(
                            "legacy writer: struct fields must be scalars")
                    fields.append((fname.strip(), ftyp.strip()))
                return (kind, fields, wrapper.strip())
            if kind == "legacy_map":
                k, v = _split_type_args(inner)
                return (kind, k.strip(), v.strip())
            if inner not in _WRITE_PHYS:
                raise ValueError(f"legacy writer: bad element type {inner!r}")
            return (kind, inner)
    if t in _WRITE_PHYS:
        return ("scalar", t)
    raise ValueError(f"legacy writer: unsupported type {t!r}")


def write_parquet_legacy(cols: dict[str, list], types: dict[str, str],
                         codec: str = "none") -> bytes:
    """Hand-built PRE-STANDARD-layout parquet writer — the fixture twin
    of the reader's LogicalTypes.md backward-compatibility support.
    Emits the legacy layouts old parquet-mr files carry, which NO
    in-sandbox library will produce (pyarrow only writes 3-level):

    * ``bare<T>``: top-level ``repeated T name`` — an implicit
      required list of required elements ([] allowed, None not);
    * ``two_level<T>``: ``optional group name (LIST) { repeated T
      element; }`` — nullable list of required elements;
    * ``two_level_struct<a:T,...[|wrapper]>``: ``optional group name
      (LIST) { repeated group <wrapper> { required fields... } }`` —
      the repeated group IS the element (multi-field, or named
      "array"/"<name>_tuple");
    * ``legacy_map<K,V>``: ``optional group name (MAP_KEY_VALUE) {
      repeated group map { required K key; optional V value; } }`` —
      the hoisted legacy form where the OUTER group carries
      MAP_KEY_VALUE instead of MAP.

    pyarrow READS all four layouts (its reader implements the same
    backward-compat rules), so tests validate these bytes against an
    independent decoder."""
    codec_id = _WRITE_CODECS[codec]

    def compress(raw: bytes) -> bytes:
        if codec == "none":
            return raw
        if codec == "snappy":
            from national_caseload_data_ingest_spark.sources.blockcodecs import (  # noqa: PLC0415
                snappy_encode,
            )
            return snappy_encode(raw)
        raise ValueError("legacy writer: codec must be none or snappy")

    names = list(cols)
    n_rows = len(cols[names[0]]) if names else 0
    parsed = {n: _parse_legacy_type(types[n]) for n in names}

    schema: list[bytes] = [_t_struct([
        (4, _T_BINARY, b"schema"),
        (5, _T_I32, len(names)),
    ])]
    leaves: list[dict] = []  # {path, typ, max_def, max_rep, shred}
    _LIST_LOGI = _t_struct([(3, _T_STRUCT, _t_struct([]))])
    for name in names:
        p = parsed[name]
        kind = p[0]
        if kind == "scalar":
            typ = p[1]
            schema.append(_legacy_elem(
                name, 1, phys=_WRITE_PHYS[typ],
                converted=0 if typ == "string" else None))
            leaves.append({"path": [name], "typ": typ,
                           "max_def": 1, "max_rep": 0, "col": name,
                           "shape": "scalar"})
        elif kind == "bare":
            typ = p[1]
            schema.append(_legacy_elem(
                name, 2, phys=_WRITE_PHYS[typ],
                converted=0 if typ == "string" else None))
            leaves.append({"path": [name], "typ": typ,
                           "max_def": 1, "max_rep": 1, "col": name,
                           "shape": "bare"})
        elif kind == "two_level":
            typ = p[1]
            schema.append(_legacy_elem(name, 1, n_children=1,
                                       converted=3, logical=_LIST_LOGI))
            schema.append(_legacy_elem(
                "element", 2, phys=_WRITE_PHYS[typ],
                converted=0 if typ == "string" else None))
            leaves.append({"path": [name, "element"], "typ": typ,
                           "max_def": 2, "max_rep": 1, "col": name,
                           "shape": "two_level"})
        elif kind == "two_level_struct":
            fields, wrapper = p[1], p[2]
            schema.append(_legacy_elem(name, 1, n_children=1,
                                       converted=3, logical=_LIST_LOGI))
            schema.append(_legacy_elem(wrapper, 2,
                                       n_children=len(fields)))
            for fname, ftyp in fields:
                schema.append(_legacy_elem(
                    fname, 0, phys=_WRITE_PHYS[ftyp],
                    converted=0 if ftyp == "string" else None))
                leaves.append({"path": [name, wrapper, fname],
                               "typ": ftyp, "max_def": 2, "max_rep": 1,
                               "col": name, "shape": "two_level_field",
                               "field": fname})
        else:  # legacy_map (hoisted MAP_KEY_VALUE on the outer group)
            ktyp, vtyp = p[1], p[2]
            schema.append(_legacy_elem(name, 1, n_children=1,
                                       converted=2))
            schema.append(_legacy_elem("map", 2, n_children=2))
            schema.append(_legacy_elem(
                "key", 0, phys=_WRITE_PHYS[ktyp],
                converted=0 if ktyp == "string" else None))
            schema.append(_legacy_elem(
                "value", 1, phys=_WRITE_PHYS[vtyp],
                converted=0 if vtyp == "string" else None))
            leaves.append({"path": [name, "map", "key"], "typ": ktyp,
                           "max_def": 2, "max_rep": 1, "col": name,
                           "shape": "map_key"})
            leaves.append({"path": [name, "map", "value"], "typ": vtyp,
                           "max_def": 3, "max_rep": 1, "col": name,
                           "shape": "map_value"})

    # Dremel shredding per leaf, legacy thresholds: the repeated level
    # itself is the only def contributor besides an optional outer
    # LIST group / optional map value.
    streams = []
    for lf in leaves:
        defs: list[int] = []
        reps: list[int] = []
        present: list = []
        shape = lf["shape"]
        for row in cols[lf["col"]]:
            if shape == "scalar":
                if row is None:
                    defs.append(0)
                else:
                    defs.append(1)
                    present.append(row)
                reps.append(0)
                continue
            if shape == "bare":
                if row is None:
                    raise ValueError(
                        "legacy writer: bare repeated lists cannot be "
                        "null (use [] — the layout has no null slot)")
                if not row:
                    defs.append(0)
                    reps.append(0)
                    continue
                for j, v in enumerate(row):
                    if v is None:
                        raise ValueError(
                            "legacy writer: legacy list elements are "
                            "required")
                    defs.append(1)
                    reps.append(0 if j == 0 else 1)
                    present.append(v)
                continue
            if shape in ("two_level", "two_level_field"):
                if row is None:
                    defs.append(0)
                    reps.append(0)
                    continue
                if not row:
                    defs.append(1)
                    reps.append(0)
                    continue
                for j, v in enumerate(row):
                    e = v[lf["field"]] if shape == "two_level_field" \
                        else v
                    if e is None:
                        raise ValueError(
                            "legacy writer: legacy list elements are "
                            "required")
                    defs.append(2)
                    reps.append(0 if j == 0 else 1)
                    present.append(e)
                continue
            # map_key / map_value (outer optional, repeated kv group)
            if row is None:
                defs.append(0)
                reps.append(0)
                continue
            if not row:
                defs.append(1)
                reps.append(0)
                continue
            for j, (k, v) in enumerate(row.items()):
                r = 0 if j == 0 else 1
                if shape == "map_key":
                    if k is None:
                        raise ValueError(
                            "legacy writer: map keys are required")
                    defs.append(2)
                    present.append(k)
                else:
                    if v is None:
                        defs.append(2)
                    else:
                        defs.append(3)
                        present.append(v)
                reps.append(r)
        streams.append({"path": lf["path"], "typ": lf["typ"],
                        "defs": defs, "reps": reps, "present": present,
                        "max_def": lf["max_def"],
                        "max_rep": lf["max_rep"]})

    out = bytearray(b"PAR1")
    chunk_metas = [
        _write_chunk(out, st, False, codec_id, compress, False, 1)
        for st in streams
    ]
    chunks = [
        _t_struct([(2, _T_I64, off), (3, _T_STRUCT, md)])
        for off, _sz, md in chunk_metas
    ]
    row_group = _t_struct([
        (1, _T_LIST, (_T_STRUCT, chunks)),
        (2, _T_I64, sum(sz for _o, sz, _m in chunk_metas)),
        (3, _T_I64, n_rows),
    ])
    footer = _t_struct([
        (1, _T_I32, 1),
        (2, _T_LIST, (_T_STRUCT, schema)),
        (3, _T_I64, n_rows),
        (4, _T_LIST, (_T_STRUCT, [row_group])),
        (6, _T_BINARY, b"ncd-spark legacy-layout fixture writer"),
    ])
    out += footer
    out += struct.pack("<I", len(footer)) + b"PAR1"
    return bytes(out)
