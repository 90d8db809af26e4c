"""Native ZIP reader — EOCD locate, central-directory walk, local-header
validation, stored/deflate payloads with CRC-32 verification.  Pure
stdlib, from the public APPNOTE.TXT format.

ZIP is this engine's FOUNDING format: the reference ingests the
national caseload ZIP archives (``/root/reference/ncd/data_zip.py``)
through Python's zipfile, and so does this repo's staging path
(``sources/data_zip.py``).  The native walker exists for the
cluster-side shape: executors holding a zip payload as BYTES (a
``binaryFiles`` row) can enumerate and verify members without a
filesystem or a ZipFile handle, and a mis-central archive fails loudly
instead of silently truncating.

* **EOCD**: scan backwards for ``PK\\x05\\x06`` (the record may be
  followed by a comment up to 64 KiB), yielding entry count and the
  central directory's offset/size; zip64 markers gate;
* **central directory**: per entry ``PK\\x01\\x02`` — compression
  method, CRC-32, compressed/uncompressed sizes, name, local offset;
* **local headers**: each entry's ``PK\\x03\\x04`` is revalidated and
  its name must match the central entry (APPNOTE's dual-bookkeeping is
  exactly where corrupt/malicious archives skew);
* payload: stored (0) or deflate (8, raw zlib); every member's CRC-32
  is VERIFIED against the central record;
* gates: zip64, encryption (general-purpose bit 0), and other
  compression methods raise.

Cross-validation: every archive the tests walk is written by stdlib
``zipfile`` (the independent implementation), both stored and deflated,
with and without archive comments.
"""

from __future__ import annotations

import struct
import zlib

_EOCD = b"PK\x05\x06"
_CENTRAL = b"PK\x01\x02"
_LOCAL = b"PK\x03\x04"


def _find_eocd(data: bytes) -> int:
    """Offset of the EOCD record (comment-tolerant backward scan)."""
    window_start = max(0, len(data) - 65536 - 22)
    idx = data.rfind(_EOCD, window_start)
    if idx < 0:
        raise ValueError("zip: no end-of-central-directory record")
    return idx


def zip_walk(data: bytes) -> list[dict]:
    """All members: ``{"name", "method", "crc32", "size",
    "compressed_size", "data"}`` — payloads decompressed and
    CRC-verified, local headers cross-checked against the central
    directory."""
    eocd = _find_eocd(data)
    (n_disk, n_total, cd_size, cd_offset) = struct.unpack_from(
        "<HHII", data, eocd + 8
    )
    if n_disk != n_total:
        raise NotImplementedError("zip: multi-disk archives")
    if n_total == 0xFFFF or cd_offset == 0xFFFFFFFF:
        raise NotImplementedError("zip: zip64 archives")
    out: list[dict] = []
    pos = cd_offset
    for _ in range(n_total):
        if data[pos : pos + 4] != _CENTRAL:
            raise ValueError("zip: bad central-directory signature")
        (flags, method, _time, _date, crc, csize, usize,
         name_len, extra_len, comment_len) = struct.unpack_from(
            "<HHHHIIIHHH", data, pos + 8
        )
        local_off = struct.unpack_from("<I", data, pos + 42)[0]
        name = data[pos + 46 : pos + 46 + name_len].decode(
            "utf-8", "replace")
        pos += 46 + name_len + extra_len + comment_len
        if flags & 0x1:
            raise NotImplementedError("zip: encrypted entries")
        # revalidate the local header (dual bookkeeping)
        if data[local_off : local_off + 4] != _LOCAL:
            raise ValueError("zip: bad local-header signature")
        (l_name_len, l_extra_len) = struct.unpack_from(
            "<HH", data, local_off + 26
        )
        l_name = data[
            local_off + 30 : local_off + 30 + l_name_len
        ].decode("utf-8", "replace")
        if l_name != name:
            raise ValueError(
                f"zip: central/local name mismatch ({name!r} vs "
                f"{l_name!r})"
            )
        body_off = local_off + 30 + l_name_len + l_extra_len
        comp = data[body_off : body_off + csize]
        if len(comp) != csize:
            raise ValueError("zip: truncated member payload")
        if method == 0:
            raw = comp
        elif method == 8:
            try:
                raw = zlib.decompress(comp, -15)
            except zlib.error as e:
                raise ValueError(f"zip: corrupt deflate ({e})") from None
        else:
            raise NotImplementedError(
                f"zip: compression method {method}"
            )
        if len(raw) != usize:
            raise ValueError("zip: uncompressed size mismatch")
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: CRC mismatch on {name!r}")
        out.append({
            "name": name, "method": method, "crc32": crc,
            "size": usize, "compressed_size": csize, "data": raw,
        })
    return out
