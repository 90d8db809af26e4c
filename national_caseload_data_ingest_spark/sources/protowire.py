"""Protocol Buffers wire-format codec (encode + decode) — pure stdlib,
from the public encoding spec (protobuf.dev/programming-guides/encoding).

Protobuf is the remaining mainstream binary interchange family beside
Avro (``sources/avro.py``) and MessagePack (``sources/msgpack.py``);
event feeds and RPC logs commonly land as length-prefixed protobuf
records.  Implemented wire features:

* base-128 varints (wire type 0), zigzag ``sint64`` values;
* fixed64 little-endian doubles (wire type 1) and fixed32 floats (5);
* LEN fields (wire type 2): UTF-8 strings, bytes, NESTED messages, and
  PACKED repeated varints (the proto3 default for repeated scalars);
* **unknown-field skipping** — the spec's forward-compatibility
  contract: a decoder must skip fields its schema doesn't know, by wire
  type, without erroring (deprecated group types 3/4 and reserved types
  raise instead).

Schema model: a message is ``[(field_number, name, type)]`` with type
one of ``"varint"``, ``"sint64"``, ``"double"``, ``"float"``,
``"string"``, ``"bytes"``, ``("packed_varint",)``, or
``("message", fields)``.  Missing fields decode to ``None`` (proto3
field presence), repeated fields accumulate in arrival order, and a
later scalar occurrence overwrites an earlier one (last-one-wins, per
the spec).

Spark shape: the established per-payload Arrow kernels — records are
length-prefixed (varint size framing, the standard streaming convention)
into one payload per partition; encode/decode never shuffle.
"""

from __future__ import annotations

import struct

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _write_varint(out: bytearray, n: int) -> None:
    if n < 0:
        # negative int64 values occupy ten bytes (two's complement)
        n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _tag(out: bytearray, field: int, wt: int) -> None:
    _write_varint(out, (field << 3) | wt)


def encode_message(fields: list[tuple], values: dict) -> bytes:
    """Encode ``values`` (name → value) under the schema; None values
    are omitted (proto3 presence)."""
    out = bytearray()
    for num, name, typ in fields:
        v = values.get(name)
        if v is None:
            continue
        if typ == "varint":
            _tag(out, num, _WT_VARINT)
            _write_varint(out, int(v))
        elif typ == "sint64":
            _tag(out, num, _WT_VARINT)
            _write_varint(out, _zigzag(int(v)))
        elif typ == "double":
            _tag(out, num, _WT_I64)
            out += struct.pack("<d", float(v))
        elif typ == "float":
            _tag(out, num, _WT_I32)
            out += struct.pack("<f", float(v))
        elif typ == "string":
            b = str(v).encode("utf-8")
            _tag(out, num, _WT_LEN)
            _write_varint(out, len(b))
            out += b
        elif typ == "bytes":
            b = bytes(v)
            _tag(out, num, _WT_LEN)
            _write_varint(out, len(b))
            out += b
        elif isinstance(typ, tuple) and typ[0] == "packed_varint":
            body = bytearray()
            for item in v:
                _write_varint(body, int(item))
            _tag(out, num, _WT_LEN)
            _write_varint(out, len(body))
            out += body
        elif isinstance(typ, tuple) and typ[0] == "message":
            b = encode_message(typ[1], v)
            _tag(out, num, _WT_LEN)
            _write_varint(out, len(b))
            out += b
        else:
            raise NotImplementedError(f"protowire: field type {typ!r}")
    return bytes(out)


def encode_unknown_field(field: int, value: int) -> bytes:
    """A varint field a schema does NOT declare — for exercising the
    decoder's unknown-field skipping."""
    out = bytearray()
    _tag(out, field, _WT_VARINT)
    _write_varint(out, value)
    return bytes(out)


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def uvarint(self) -> int:
        """Raw unsigned base-128 varint (0 .. 2^64-1)."""
        shift = 0
        n = 0
        while True:
            if self.pos >= len(self.d):
                raise ValueError("protowire: truncated varint")
            b = self.d[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("protowire: varint over 10 bytes")
        return n

    def varint(self) -> int:
        """Field-value varint: two's-complement int64."""
        n = self.uvarint()
        if n >= 1 << 63:  # negative int64 in two's complement
            n -= 1 << 64
        return n

    def length(self) -> int:
        """LEN-field / frame length: must be a non-negative length that
        cannot exceed int63 — a varint with bit 63 set is an attack or
        corruption, never a real length (two's-complement would turn it
        negative and walk the cursor backwards: the hang class)."""
        n = self.uvarint()
        if n >= 1 << 63:
            raise ValueError(
                f"protowire: length varint out of range ({n:#x})"
            )
        return n

    def take(self, n: int) -> bytes:
        if n < 0:
            raise ValueError(f"protowire: negative read length {n}")
        if self.pos + n > len(self.d):
            raise ValueError("protowire: truncated field")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return bytes(out)


def decode_message(fields: list[tuple], data: bytes) -> dict:
    """Decode one message; unknown fields are SKIPPED by wire type."""
    by_num = {num: (name, typ) for num, name, typ in fields}
    out: dict = {
        name: ([] if isinstance(typ, tuple) and typ[0] == "packed_varint"
               else None)
        for _num, name, typ in fields
    }
    r = _Reader(data)
    while r.pos < len(r.d):
        key = r.uvarint()
        num, wt = key >> 3, key & 7
        if num not in by_num:
            # forward compatibility: skip by wire type
            if wt == _WT_VARINT:
                r.varint()
            elif wt == _WT_I64:
                r.take(8)
            elif wt == _WT_LEN:
                r.take(r.length())
            elif wt == _WT_I32:
                r.take(4)
            else:
                raise ValueError(
                    f"protowire: cannot skip wire type {wt} "
                    "(deprecated group or reserved)"
                )
            continue
        name, typ = by_num[num]
        if typ == "varint":
            if wt != _WT_VARINT:
                raise ValueError("protowire: varint needs wire type 0")
            out[name] = r.varint()
        elif typ == "sint64":
            if wt != _WT_VARINT:
                raise ValueError("protowire: sint64 needs wire type 0")
            z = r.varint()
            out[name] = _unzigzag(z & ((1 << 64) - 1))
        elif typ == "double":
            if wt != _WT_I64:
                raise ValueError("protowire: double needs wire type 1")
            out[name] = struct.unpack("<d", r.take(8))[0]
        elif typ == "float":
            if wt != _WT_I32:
                raise ValueError("protowire: float needs wire type 5")
            out[name] = struct.unpack("<f", r.take(4))[0]
        elif wt != _WT_LEN:
            # every remaining kind is length-delimited
            raise ValueError(
                f"protowire: {typ!r} needs wire type 2, got {wt}"
            )
        elif typ == "string":
            out[name] = r.take(r.length()).decode("utf-8")
        elif typ == "bytes":
            out[name] = r.take(r.length())
        elif isinstance(typ, tuple) and typ[0] == "packed_varint":
            body = _Reader(r.take(r.length()))
            while body.pos < len(body.d):
                out[name].append(body.varint())
        elif isinstance(typ, tuple) and typ[0] == "message":
            out[name] = decode_message(typ[1], r.take(r.length()))
        else:  # pragma: no cover - encoder gates first
            raise NotImplementedError(f"protowire: field type {typ!r}")
    return out


def frame_records(records: list[bytes]) -> bytes:
    """Length-prefix (varint) framing — the standard protobuf stream."""
    out = bytearray()
    for rec in records:
        _write_varint(out, len(rec))
        out += rec
    return bytes(out)


def unframe_records(payload: bytes) -> list[bytes]:
    r = _Reader(payload)
    out = []
    while r.pos < len(r.d):
        out.append(r.take(r.length()))
    return out
