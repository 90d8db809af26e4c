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
