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
  central directory's offset/size;
* **zip64**: when any EOCD field is maxed (0xFFFF / 0xFFFFFFFF), the
  ``PK\\x06\\x07`` EOCD64 LOCATOR (fixed 20 bytes immediately before
  the EOCD) points at the ``PK\\x06\\x06`` EOCD64 record carrying the
  8-byte entry count / cd size / cd offset; per-entry maxed fields
  resolve through the 0x0001 "zip64 extended information" extra field,
  whose 8-byte values appear IN ORDER for exactly the fields that are
  maxed (APPNOTE 4.5.3) — so >4 GiB members and >65535-entry archives
  need only header arithmetic;
* **central directory**: per entry ``PK\\x01\\x02`` — compression
  method, CRC-32, compressed/uncompressed sizes, name, local offset;
* **local headers**: each entry's ``PK\\x03\\x04`` is revalidated and
  its name must match the central entry (APPNOTE's dual-bookkeeping is
  exactly where corrupt/malicious archives skew);
* payload: stored (0) or deflate (8, raw zlib); every member's CRC-32
  is VERIFIED against the central record;
* gates: multi-disk and other compression methods raise; encrypted
  members (general-purpose bit 0) raise by default or surface as
  dead-letter rows under ``on_encrypted="quarantine"``.

Cross-validation: every archive the tests walk is written by stdlib
``zipfile`` (the independent implementation), both stored and deflated,
with and without archive comments.
"""

from __future__ import annotations

import struct
import zlib

_EOCD = b"PK\x05\x06"
_EOCD64_LOC = b"PK\x06\x07"
_EOCD64 = b"PK\x06\x06"
_CENTRAL = b"PK\x01\x02"
_LOCAL = b"PK\x03\x04"
_MAX16, _MAX32 = 0xFFFF, 0xFFFFFFFF


def _find_eocd(data: bytes) -> int:
    """Offset of the EOCD record (comment-tolerant backward scan)."""
    window_start = max(0, len(data) - 65536 - 22)
    idx = data.rfind(_EOCD, window_start)
    if idx < 0:
        raise ValueError("zip: no end-of-central-directory record")
    return idx


def _read_eocd64(data: bytes, eocd: int) -> tuple[int, int, int]:
    """Resolve (n_total, cd_size, cd_offset) through the zip64 EOCD
    locator + record.  The locator is FIXED-SIZE and sits immediately
    before the EOCD (APPNOTE 4.3.15)."""
    loc_at = eocd - 20
    if loc_at < 0 or data[loc_at : loc_at + 4] != _EOCD64_LOC:
        raise ValueError(
            "zip: EOCD fields maxed but no zip64 EOCD locator")
    loc_disk, rec_off, n_disks = struct.unpack_from(
        "<IQI", data, loc_at + 4)
    if n_disks > 1 or loc_disk != 0:
        raise NotImplementedError("zip: multi-disk zip64 archives")
    if rec_off + 56 > len(data) or \
            data[rec_off : rec_off + 4] != _EOCD64:
        raise ValueError("zip: zip64 EOCD record missing or truncated")
    (_rec_size, _ver_made, _ver_need, disk_num, cd_disk, n_this,
     n_total, cd_size, cd_offset) = struct.unpack_from(
        "<QHHIIQQQQ", data, rec_off + 4)
    if disk_num != cd_disk or n_this != n_total:
        raise NotImplementedError("zip: multi-disk zip64 archives")
    return n_total, cd_size, cd_offset


def _zip64_extra(extra: bytes, usize: int, csize: int,
                 local_off: int) -> tuple[int, int, int]:
    """Resolve maxed central-entry fields through the 0x0001 zip64
    extended-information extra field.  Its payload carries 8-byte
    values IN ORDER for exactly the fields set to 0xFFFFFFFF in the
    fixed record (APPNOTE 4.5.3) — so the field widths depend on which
    classic fields are maxed, not on the payload length alone."""
    need = ((usize == _MAX32) + (csize == _MAX32)
            + (local_off == _MAX32))
    if not need:
        return usize, csize, local_off
    pos = 0
    while pos + 4 <= len(extra):
        fid, flen = struct.unpack_from("<HH", extra, pos)
        pos += 4
        if fid != 0x0001:
            pos += flen
            continue
        if flen < 8 * need:
            raise ValueError(
                "zip: zip64 extra field too short for the maxed "
                f"fields ({flen} bytes, need {8 * need * 1})")
        at = pos
        if usize == _MAX32:
            usize = struct.unpack_from("<Q", extra, at)[0]
            at += 8
        if csize == _MAX32:
            csize = struct.unpack_from("<Q", extra, at)[0]
            at += 8
        if local_off == _MAX32:
            local_off = struct.unpack_from("<Q", extra, at)[0]
        return usize, csize, local_off
    raise ValueError(
        "zip: central fields maxed but no zip64 extra field")


def to_zip64(data: bytes) -> bytes:
    """The zip64 WRITER twin: rewrite a classic archive's central
    directory into zip64 form — every entry's size/offset fields maxed
    and carried in a 0x0001 extra, counts/offsets moved into an EOCD64
    record + locator behind a fully-maxed EOCD.  Local headers and
    payloads stay byte-identical (only the tail is rebuilt), so the
    transform exercises exactly the decode paths a >4 GiB archive
    needs, without the bytes."""
    eocd = _find_eocd(data)
    (n_disk, n_total, cd_size, cd_offset) = struct.unpack_from(
        "<HHII", data, eocd + 8)
    if n_total == _MAX16 or cd_offset == _MAX32:
        return data  # already zip64
    if n_disk != n_total:
        raise NotImplementedError("zip: multi-disk archives")
    comment_len = struct.unpack_from("<H", data, eocd + 20)[0]
    comment = data[eocd + 22 : eocd + 22 + comment_len]
    new_cd = bytearray()
    pos = cd_offset
    for _ in range(n_total):
        if data[pos : pos + 4] != _CENTRAL:
            raise ValueError("zip: bad central-directory signature")
        (ver_made, ver_need, flags, method, mtime, mdate, crc, csize,
         usize, name_len, extra_len, cmt_len, disk_start, int_attr,
         ext_attr, local_off) = struct.unpack_from(
            "<HHHHHHIIIHHHHHII", data, pos + 8 - 4)
        name = data[pos + 46 : pos + 46 + name_len]
        old_extra = data[pos + 46 + name_len
                         : pos + 46 + name_len + extra_len]
        cmt = data[pos + 46 + name_len + extra_len
                   : pos + 46 + name_len + extra_len + cmt_len]
        pos += 46 + name_len + extra_len + cmt_len
        z64 = (b"\x01\x00\x18\x00" + usize.to_bytes(8, "little")
               + csize.to_bytes(8, "little")
               + local_off.to_bytes(8, "little"))
        # keep pre-existing extras (UT/ntfs timestamps, unix uid/gid…);
        # the zip64 0x0001 field is APPENDED, not a replacement
        new_extra = old_extra + z64
        new_cd += _CENTRAL + struct.pack(
            "<HHHHHHIIIHHHHHII", max(ver_made, 45), max(ver_need, 45),
            flags, method, mtime, mdate, crc, _MAX32, _MAX32,
            name_len, len(new_extra), cmt_len, disk_start, int_attr,
            ext_attr, _MAX32)
        new_cd += name + new_extra + cmt
    body = data[:cd_offset]
    eocd64_off = cd_offset + len(new_cd)
    eocd64 = _EOCD64 + struct.pack(
        "<QHHIIQQQQ", 44, 45, 45, 0, 0, n_total, n_total,
        len(new_cd), cd_offset)
    locator = _EOCD64_LOC + struct.pack("<IQI", 0, eocd64_off, 1)
    new_eocd = _EOCD + struct.pack(
        "<HHHHIIH", _MAX16, _MAX16, _MAX16, _MAX16, _MAX32, _MAX32,
        len(comment)) + comment
    return bytes(body) + bytes(new_cd) + eocd64 + locator + new_eocd


def zip_walk(data: bytes, on_encrypted: str = "raise") -> list[dict]:
    """All members: ``{"name", "method", "crc32", "size",
    "compressed_size", "data", "quarantined", "reason"}`` — payloads
    decompressed and CRC-verified, local headers cross-checked against
    the central directory.

    ``on_encrypted`` sets the policy for members with general-purpose
    bit 0 set: ``"raise"`` (default, the historical gate) or
    ``"quarantine"`` — surface the member as a dead-letter row
    (``data=b""``, ``quarantined=True``, a human-readable ``reason``)
    so one protected member never gates the rest of the archive,
    matching the engine's streaming quarantine design
    (``streaming/txlog_sink.quarantine_stream``)."""
    if on_encrypted not in ("raise", "quarantine"):
        raise ValueError(f"zip: unknown policy {on_encrypted!r}")
    eocd = _find_eocd(data)
    (n_disk, n_total, cd_size, cd_offset) = struct.unpack_from(
        "<HHII", data, eocd + 8
    )
    if (n_total == _MAX16 or n_disk == _MAX16 or cd_size == _MAX32
            or cd_offset == _MAX32):
        n_total, cd_size, cd_offset = _read_eocd64(data, eocd)
    elif n_disk != n_total:
        raise NotImplementedError("zip: multi-disk archives")
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
        extra = data[pos + 46 + name_len
                     : pos + 46 + name_len + extra_len]
        usize, csize, local_off = _zip64_extra(
            extra, usize, csize, local_off)
        pos += 46 + name_len + extra_len + comment_len
        if flags & 0x1 and on_encrypted == "raise":
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
        if flags & 0x1:  # quarantine: never touch the ciphertext
            out.append({
                "name": name, "method": method, "crc32": crc,
                "size": usize, "compressed_size": csize, "data": b"",
                "quarantined": True,
                "reason": "encrypted (general-purpose bit 0)",
            })
            continue
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
            "quarantined": False, "reason": None,
        })
    return out
