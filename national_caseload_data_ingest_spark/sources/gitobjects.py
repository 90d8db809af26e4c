"""Native git object-store reader — loose objects, packfiles (v2), both
delta encodings, and the tree/commit grammars.  Pure stdlib, from the
public format documentation (Documentation/gitformat-pack.txt and
gitformat-loose.txt in git's own tree).

Code is a first-class LLM training corpus and it ships as GIT
REPOSITORIES — reading them at scale without shelling out to a git
binary per file means parsing the object store directly:

* **loose objects**: zlib streams of ``"<type> <size>\\0" + body``;
* **packfiles**: ``PACK`` v2 header, per-entry type+size varint (4.7-bit
  little-endian continuation), back-to-back zlib streams (boundaries
  recovered via ``decompressobj().unused_data`` — the WARC member
  trick), a trailing SHA-1 over everything before it (verified);
* **OFS_DELTA** (negative-offset base reference with the off-by-one
  accumulation rule: each continuation adds ``(value+1) << 7``) and
  **REF_DELTA** (20-byte base SHA-1) entries, resolved by replaying the
  delta opcodes: copy (bit 0x80: offset/size in sparse little-endian
  bytes, size 0 means 0x10000) and insert (literal 1-127 bytes);
  opcode 0 is reserved and raises;
* object ids: ``sha1("<type> <size>\\0" + body)`` — every decoded
  object's id is computed, so REF_DELTA bases resolve and tests can
  cross-check ids against the real git binary;
* **tree** entries (``"<mode> <name>\\0" + 20-byte sha``) and **commit**
  headers (tree/parent/author/committer + message after the blank
  line).

The test fixtures are built by the REAL git binary (git 2.x writes the
packs via ``git gc`` / ``git pack-objects``), so the walker is
cross-validated against the canonical implementation; the query
fixtures use this module's own encoder twin (deterministic bytes, the
codec convention) with the delta path load-bearing.

Spark shape: one pack per payload row, per-payload Arrow kernel, zero
shuffle.  A 100 TB code corpus is many packs; parallelism is pack
count, and delta chains resolve within a pack (git's own locality
guarantee for packed bases).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

_TYPES = {1: "commit", 2: "tree", 3: "blob", 4: "tag",
          6: "ofs_delta", 7: "ref_delta"}


def object_id(otype: str, body: bytes) -> bytes:
    return hashlib.sha1(
        f"{otype} {len(body)}".encode() + b"\x00" + body
    ).digest()


def read_loose(data: bytes) -> tuple[str, bytes]:
    """One loose-object file → (type, body)."""
    raw = zlib.decompress(data)
    header, sep, body = raw.partition(b"\x00")
    if not sep:
        raise ValueError("git: loose object missing header NUL")
    otype, _, size = header.decode("ascii", "replace").partition(" ")
    if otype not in ("commit", "tree", "blob", "tag"):
        raise ValueError(f"git: bad loose object type {otype!r}")
    if int(size) != len(body):
        raise ValueError("git: loose object size mismatch")
    return otype, body


def _apply_delta(base: bytes, delta: bytes) -> bytes:
    """Replay git's delta opcodes (copy/insert) against a base."""
    pos = 0

    def varint() -> int:
        nonlocal pos
        shift = 0
        n = 0
        while True:
            b = delta[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    base_size = varint()
    if base_size != len(base):
        raise ValueError("git: delta base size mismatch")
    result_size = varint()
    out = bytearray()
    while pos < len(delta):
        op = delta[pos]
        pos += 1
        if op & 0x80:  # copy from base
            offset = 0
            size = 0
            for i in range(4):
                if op & (1 << i):
                    offset |= delta[pos] << (8 * i)
                    pos += 1
            for i in range(3):
                if op & (1 << (4 + i)):
                    size |= delta[pos] << (8 * i)
                    pos += 1
            if size == 0:
                size = 0x10000
            if offset + size > len(base):
                raise ValueError("git: delta copy beyond base")
            out += base[offset : offset + size]
        elif op:  # insert literal
            out += delta[pos : pos + op]
            pos += op
        else:
            raise ValueError("git: reserved delta opcode 0")
    if len(out) != result_size:
        raise ValueError("git: delta result size mismatch")
    return bytes(out)


def read_pack(data: bytes) -> list[dict]:
    """One packfile → decoded objects in pack order:
    ``{"otype", "body", "oid", "offset"}`` with all deltas resolved.
    The trailing SHA-1 is verified before any parsing is trusted."""
    if data[:4] != b"PACK":
        raise ValueError("git: bad pack magic")
    version = struct.unpack_from(">I", data, 4)[0]
    if version != 2:
        raise NotImplementedError(f"git: pack version {version}")
    count = struct.unpack_from(">I", data, 8)[0]
    if hashlib.sha1(data[:-20]).digest() != data[-20:]:
        raise ValueError("git: pack checksum mismatch")
    pos = 12
    by_offset: dict[int, tuple[str, bytes]] = {}
    by_id: dict[bytes, tuple[str, bytes]] = {}
    out: list[dict] = []
    for _ in range(count):
        entry_offset = pos
        b = data[pos]
        pos += 1
        otype_n = (b >> 4) & 7
        size = b & 0x0F
        shift = 4
        while b & 0x80:
            b = data[pos]
            pos += 1
            size |= (b & 0x7F) << shift
            shift += 7
        otype = _TYPES.get(otype_n)
        if otype is None:
            raise ValueError(f"git: bad pack object type {otype_n}")
        base: tuple[str, bytes] | None = None
        if otype == "ofs_delta":
            # negative offset, big-endian 7-bit groups with the
            # +1-per-continuation accumulation rule
            b = data[pos]
            pos += 1
            off = b & 0x7F
            while b & 0x80:
                b = data[pos]
                pos += 1
                off = ((off + 1) << 7) | (b & 0x7F)
            base_offset = entry_offset - off
            if base_offset not in by_offset:
                raise ValueError("git: ofs_delta base not seen")
            base = by_offset[base_offset]
        elif otype == "ref_delta":
            sha = data[pos : pos + 20]
            pos += 20
            if sha not in by_id:
                raise ValueError("git: ref_delta base not in pack")
            base = by_id[sha]
        d = zlib.decompressobj()
        body = d.decompress(data[pos:])
        body += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed
        if base is not None:
            if len(body) != size:
                raise ValueError("git: delta payload size mismatch")
            otype = base[0]
            body = _apply_delta(base[1], body)
        elif len(body) != size:
            raise ValueError("git: object size mismatch")
        oid = object_id(otype, body)
        by_offset[entry_offset] = (otype, body)
        by_id[oid] = (otype, body)
        out.append({"otype": otype, "body": body, "oid": oid,
                    "offset": entry_offset})
    return out


def parse_tree(body: bytes) -> list[dict]:
    """Tree body → [{"mode", "name", "oid"}] in storage order."""
    out = []
    pos = 0
    while pos < len(body):
        sp = body.index(b" ", pos)
        nul = body.index(b"\x00", sp)
        out.append({
            "mode": body[pos:sp].decode("ascii"),
            "name": body[sp + 1 : nul].decode("utf-8", "replace"),
            "oid": body[nul + 1 : nul + 21],
        })
        pos = nul + 21
    return out


def parse_commit(body: bytes) -> dict:
    """Commit body → {"tree", "parents", "author", "message"}."""
    head, sep, message = body.partition(b"\n\n")
    if not sep:
        raise ValueError("git: commit missing header/message separator")
    info: dict = {"parents": [], "tree": None, "author": None}
    for line in head.split(b"\n"):
        key, _, val = line.partition(b" ")
        if key == b"tree":
            info["tree"] = bytes.fromhex(val.decode())
        elif key == b"parent":
            info["parents"].append(bytes.fromhex(val.decode()))
        elif key == b"author":
            info["author"] = val.decode("utf-8", "replace")
    info["message"] = message.decode("utf-8", "replace")
    return info


# -- encoder twin (deterministic fixture packs) -----------------------------

def _pack_entry(otype_n: int, payload: bytes,
                raw_size: int) -> bytes:
    out = bytearray()
    b0 = (otype_n << 4) | (raw_size & 0x0F)
    raw_size >>= 4
    if raw_size:
        b0 |= 0x80
    out.append(b0)
    while raw_size:
        b = raw_size & 0x7F
        raw_size >>= 7
        if raw_size:
            b |= 0x80
        out.append(b)
    out += payload
    return bytes(out)


def _ofs_encode(off: int) -> bytes:
    """Inverse of the +1-accumulation offset decode."""
    groups = [off & 0x7F]
    off >>= 7
    while off:
        off -= 1
        groups.append(off & 0x7F)
        off >>= 7
    groups.reverse()
    out = bytearray()
    for g in groups[:-1]:
        out.append(g | 0x80)
    out.append(groups[-1])
    return bytes(out)


def build_pack(objects: list[tuple]) -> bytes:
    """Deterministic pack v2 from ``(otype, body)`` and
    ``("ofs_delta", base_index, delta_body)`` /
    ``("ref_delta", base_index, delta_body)`` entries."""
    type_n = {"commit": 1, "tree": 2, "blob": 3, "tag": 4}
    out = bytearray(b"PACK" + struct.pack(">II", 2, len(objects)))
    offsets: list[int] = []
    bodies: list[tuple[str, bytes]] = []
    for entry in objects:
        offsets.append(len(out))
        if entry[0] in ("ofs_delta", "ref_delta"):
            _kind, base_idx, delta = entry
            comp = zlib.compress(delta)
            if entry[0] == "ofs_delta":
                ref = _ofs_encode(offsets[-1] - offsets[base_idx])
                out += _pack_entry(6, ref + comp, len(delta))
            else:
                base_type, base_body = bodies[base_idx]
                out += _pack_entry(
                    7, object_id(base_type, base_body) + comp, len(delta)
                )
            base_type, base_body = bodies[base_idx]
            bodies.append((base_type, _apply_delta(base_body, delta)))
        else:
            otype, body = entry
            out += _pack_entry(type_n[otype], zlib.compress(body),
                               len(body))
            bodies.append((otype, body))
    out += hashlib.sha1(out).digest()
    return bytes(out)


def make_delta(base: bytes, target_suffix: bytes) -> bytes:
    """A minimal delta: copy the whole base, insert a suffix — enough
    to make the copy AND insert opcodes load-bearing."""
    out = bytearray()

    def varint(n: int) -> None:
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    varint(len(base))
    varint(len(base) + len(target_suffix))
    # copy: offset 0 (no offset bytes), explicit size bytes
    size = len(base)
    op = 0x80
    size_bytes = []
    for i in range(3):
        byte = (size >> (8 * i)) & 0xFF
        if byte:
            op |= 1 << (4 + i)
            size_bytes.append(byte)
    out.append(op)
    out += bytes(size_bytes)
    # inserts in <=127-byte literals
    for i in range(0, len(target_suffix), 127):
        chunk = target_suffix[i : i + 127]
        out.append(len(chunk))
        out += chunk
    return bytes(out)
