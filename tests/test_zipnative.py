"""Native ZIP walker (sources/zipnative.py): archives written by stdlib
zipfile (the independent implementation), plus hand-tampered bytes for
the guards stdlib never produces."""

from __future__ import annotations

import io
import zipfile

import pytest

from national_caseload_data_ingest_spark.sources.zipnative import (
    zip_walk,
)


def _zip(members, comment=b"", method=zipfile.ZIP_DEFLATED) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            zf.writestr(name, data, compress_type=method)
        if comment:
            zf.comment = comment
    return buf.getvalue()


def test_walk_matches_stdlib():
    members = [("a.txt", b"alpha " * 100), ("d/b.bin", bytes(range(256))),
               ("empty", b"")]
    for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        payload = _zip(members, method=method)
        got = zip_walk(payload)
        assert [(m["name"], m["data"]) for m in got] == members
        want_method = 0 if method == zipfile.ZIP_STORED else 8
        # stdlib stores empty members as stored regardless
        assert all(m["method"] in (0, want_method) for m in got)


def test_eocd_backward_scan_with_comment():
    payload = _zip([("x", b"data")], comment=b"c" * 7000)
    assert [m["name"] for m in zip_walk(payload)] == ["x"]


def test_crc_and_name_guards():
    payload = bytearray(_zip([("f.txt", b"payload bytes here")],
                             method=zipfile.ZIP_STORED))
    # flip a payload byte: CRC must catch it
    idx = bytes(payload).find(b"payload bytes here")
    payload[idx] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        zip_walk(bytes(payload))
    # tamper the LOCAL name only: dual-bookkeeping check trips
    payload = bytearray(_zip([("f.txt", b"x")]))
    lidx = bytes(payload).find(b"f.txt")  # first hit = local header copy
    payload[lidx] = ord("g")
    with pytest.raises(ValueError, match="name mismatch"):
        zip_walk(bytes(payload))


def test_zip64_stdlib_archive_roundtrips():
    """REAL zip64 archives from stdlib zipfile: force_zip64 members
    walk cleanly, and an archive crossing the 65535-entry threshold
    makes stdlib emit a genuine EOCD64 record + locator."""
    buf = io.BytesIO()
    members = [("big/a.bin", b"alpha " * 200), ("b.txt", b"beta")]
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            with zf.open(zipfile.ZipInfo(name), "w",
                         force_zip64=True) as f:
                f.write(data)
    got = zip_walk(buf.getvalue())
    assert [(m["name"], m["data"]) for m in got] == members

    buf = io.BytesIO()
    n = 65536  # one past the classic EOCD's 16-bit entry count
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n):
            zf.writestr(f"m{i:05d}", b"")
    payload = buf.getvalue()
    assert b"PK\x06\x06" in payload  # stdlib wrote a real EOCD64
    got = zip_walk(payload)
    assert len(got) == n
    assert got[0]["name"] == "m00000" and got[-1]["name"] == "m65535"


def test_zip64_header_arithmetic_beyond_4gib():
    """>4 GiB members need only the HEADER math: the 0x0001 extra's
    8-byte values must be taken in field order, for exactly the maxed
    fields (a sparse forged archive, no giant fixture)."""
    from national_caseload_data_ingest_spark.sources.zipnative import (
        _zip64_extra,
    )
    five_gib = 5 * 2**30
    extra = (b"\x01\x00\x18\x00"
             + five_gib.to_bytes(8, "little")
             + (five_gib + 7).to_bytes(8, "little")
             + (2**33).to_bytes(8, "little"))
    assert _zip64_extra(extra, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF) \
        == (five_gib, five_gib + 7, 2**33)
    # ONLY the offset maxed: the single 8-byte value is the offset
    extra = b"\x01\x00\x08\x00" + (2**35).to_bytes(8, "little")
    assert _zip64_extra(extra, 100, 50, 0xFFFFFFFF) == (100, 50, 2**35)
    # maxed fields but no zip64 extra present: loud error
    with pytest.raises(ValueError, match="no zip64 extra"):
        _zip64_extra(b"\x99\x99\x04\x00abcd", 0xFFFFFFFF, 1, 2)
    # extra too short for the number of maxed fields: loud error
    with pytest.raises(ValueError, match="too short"):
        _zip64_extra(b"\x01\x00\x08\x00" + bytes(8),
                     0xFFFFFFFF, 0xFFFFFFFF, 2)


def test_to_zip64_rewrite_roundtrips():
    """to_zip64 rewrites only the container tail: the walk output is
    identical to the classic archive's, the EOCD64 machinery is real,
    and the archive comment survives."""
    from national_caseload_data_ingest_spark.sources.zipnative import (
        to_zip64,
    )
    members = [("a.txt", b"alpha " * 100), ("d/b.bin", bytes(range(256)))]
    classic = _zip(members, comment=b"kept comment")
    z64 = to_zip64(classic)
    assert z64 != classic
    assert b"PK\x06\x06" in z64 and b"PK\x06\x07" in z64
    assert z64.endswith(b"kept comment")
    want = [(m["name"], m["data"], m["method"]) for m in zip_walk(classic)]
    got = [(m["name"], m["data"], m["method"]) for m in zip_walk(z64)]
    assert got == want
    # idempotent: an already-zip64 archive passes through unchanged
    assert to_zip64(z64) == z64
    # stdlib agrees the rewrite is a valid archive
    with zipfile.ZipFile(io.BytesIO(z64)) as zf:
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] \
            == members


def test_zip64_forged_sparse_archive_walks():
    """Hand-forge a zip64 container around a small member: classic
    EOCD fully maxed, counts/offsets only in the EOCD64 record, the
    entry's size/offset fields maxed and resolved via the extra."""
    import struct
    import zlib as _z

    name, data = b"sparse.bin", b"tiny payload"
    crc = _z.crc32(data) & 0xFFFFFFFF
    local = (b"PK\x03\x04" + struct.pack("<HHHHHIII", 45, 0, 0, 0, 0,
                                         crc, len(data), len(data))
             + struct.pack("<HH", len(name), 0) + name + data)
    extra = (b"\x01\x00\x18\x00"
             + len(data).to_bytes(8, "little")
             + len(data).to_bytes(8, "little")
             + (0).to_bytes(8, "little"))  # local header at offset 0
    central = (b"PK\x01\x02" + struct.pack(
        "<HHHHHHIII", 45, 45, 0, 0, 0, 0, crc, 0xFFFFFFFF, 0xFFFFFFFF)
        + struct.pack("<HHHHHII", len(name), len(extra), 0, 0, 0, 0,
                      0xFFFFFFFF)
        + name + extra)
    cd_off = len(local)
    eocd64_off = cd_off + len(central)
    eocd64 = (b"PK\x06\x06" + struct.pack(
        "<QHHIIQQQQ", 44, 45, 45, 0, 0, 1, 1, len(central), cd_off))
    locator = b"PK\x06\x07" + struct.pack("<IQI", 0, eocd64_off, 1)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF,
        0xFFFFFFFF, 0xFFFFFFFF, 0)
    payload = local + central + eocd64 + locator + eocd
    got = zip_walk(payload)
    assert [(m["name"], m["data"], m["size"]) for m in got] == [
        ("sparse.bin", data, len(data))]
    # chop the EOCD64 record out: the locator dangles, loud error
    with pytest.raises(ValueError, match="zip64 EOCD record"):
        zip_walk(local + central + locator + eocd)
    # maxed EOCD with no locator at all: loud error
    with pytest.raises(ValueError, match="locator"):
        zip_walk(local + central + eocd)


def test_gates_and_structure_errors():
    with pytest.raises(ValueError, match="end-of-central"):
        zip_walk(b"not a zip at all")
    payload = bytearray(_zip([("f", b"x")]))
    # flip the encryption bit in the central entry's flags
    cidx = bytes(payload).find(b"PK\x01\x02")
    payload[cidx + 8] |= 1
    with pytest.raises(NotImplementedError, match="encrypted"):
        zip_walk(bytes(payload))
    # unsupported method in the central entry
    payload = bytearray(_zip([("f", b"x")], method=zipfile.ZIP_STORED))
    cidx = bytes(payload).find(b"PK\x01\x02")
    payload[cidx + 10] = 99
    with pytest.raises(NotImplementedError, match="method"):
        zip_walk(bytes(payload))


def test_to_zip64_preserves_existing_extra_fields():
    """to_zip64 APPENDS the 0x0001 extra to each central entry instead
    of replacing the extra-field block — pre-existing extras (UT
    timestamps, unix uid/gid, ...) must survive the rewrite."""
    from national_caseload_data_ingest_spark.sources.zipnative import (
        to_zip64,
    )
    ut_extra = b"UT\x05\x00\x01\x78\x56\x34\x12"  # 0x5455 mtime extra
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("extra.txt")
        zi.extra = ut_extra
        zf.writestr(zi, b"payload " * 50)
    classic = buf.getvalue()
    z64 = to_zip64(classic)
    with zipfile.ZipFile(io.BytesIO(z64)) as zf:
        info = zf.infolist()[0]
        assert ut_extra in info.extra  # UT field kept
        assert b"\x01\x00\x18\x00" in info.extra  # zip64 field appended
        assert zf.read(info) == b"payload " * 50
    got = zip_walk(z64)
    assert got[0]["data"] == b"payload " * 50


def test_encrypted_member_quarantine_policy():
    """An encrypted member (general-purpose bit 0) raises under the
    default policy but surfaces as a dead-letter row under
    on_encrypted="quarantine" — good members still decode and
    CRC-verify, the ciphertext is never exposed."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ok.txt", b"clear text " * 20,
                    compress_type=zipfile.ZIP_DEFLATED)
        zf.writestr("enc.bin", b"pretend-ciphertext")
        enc_off = zf.infolist()[-1].header_offset
    payload = bytearray(buf.getvalue())
    payload[enc_off + 6] |= 0x01  # local flags
    at = payload.rfind(b"PK\x01\x02")
    while at >= 0:
        nl = int.from_bytes(payload[at + 28 : at + 30], "little")
        if payload[at + 46 : at + 46 + nl] == b"enc.bin":
            payload[at + 8] |= 0x01  # central flags
            break
        at = payload.rfind(b"PK\x01\x02", 0, at)
    payload = bytes(payload)
    with pytest.raises(NotImplementedError, match="encrypted"):
        zip_walk(payload)
    got = zip_walk(payload, on_encrypted="quarantine")
    assert [m["name"] for m in got] == ["ok.txt", "enc.bin"]
    assert got[0]["quarantined"] is False and got[0]["reason"] is None
    assert got[0]["data"] == b"clear text " * 20
    assert got[1]["quarantined"] is True
    assert "encrypted" in got[1]["reason"]
    assert got[1]["data"] == b""  # ciphertext never surfaced
    assert got[1]["size"] == len(b"pretend-ciphertext")
    with pytest.raises(ValueError, match="policy"):
        zip_walk(payload, on_encrypted="ignore")
