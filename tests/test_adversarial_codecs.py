"""Adversarial-bytes discipline for the continuation-session parsers
(the codec_gate_report convention): malformed or hostile input must be
a CLEAN ValueError / NotImplementedError — never a RecursionError,
IndexError, hang, or silent wrong answer that kills an executor."""

from __future__ import annotations

import random

import pytest

from national_caseload_data_ingest_spark.sources.cbor import (
    cbor_decode_one,
)
from national_caseload_data_ingest_spark.sources.mime import walk_message
from national_caseload_data_ingest_spark.sources.msgpack import _Unpacker
from national_caseload_data_ingest_spark.sources.protowire import (
    decode_message,
    unframe_records,
)
from national_caseload_data_ingest_spark.sources.sqlitefile import (
    SQLiteFile,
)

CLEAN = (ValueError, NotImplementedError, UnicodeDecodeError)


def test_nesting_bombs_gate_cleanly():
    """Deeply nested arrays/maps must hit the depth gate, not Python's
    recursion limit (a RecursionError mid-kernel kills the task)."""
    with pytest.raises(ValueError, match="nesting"):
        cbor_decode_one(b"\x81" * 5000 + b"\x00")
    with pytest.raises(ValueError, match="nesting"):
        cbor_decode_one(b"\xa1\x00" * 5000 + b"\x00")
    with pytest.raises(ValueError, match="nesting"):
        _Unpacker(b"\x91" * 5000 + b"\x00").value()
    with pytest.raises(ValueError, match="nesting"):
        _Unpacker(b"\x81" * 5000 + b"\x00").value()
    # shallow nesting still decodes
    assert cbor_decode_one(b"\x81" * 100 + b"\x00") is not None
    assert _Unpacker(b"\x91" * 100 + b"\x00").value() is not None
    # mime multipart nesting gate
    raw = b"Content-Type: multipart/mixed; boundary=B\n\n--B\n" * 100
    with pytest.raises(ValueError):
        walk_message(
            _nested_multipart(80)
        )


def _nested_multipart(depth: int) -> bytes:
    inner = b"Content-Type: text/plain\n\nx\n"
    for _i in range(depth):
        inner = (
            b"Content-Type: multipart/mixed; boundary=B\n\n"
            b"--B\n" + inner + b"\n--B--\n"
        )
    return inner


def test_random_bytes_never_crash_unclean():
    rng = random.Random(20260816)
    for trial in range(300):
        n = rng.randint(0, 200)
        payload = bytes(rng.getrandbits(8) for _ in range(n))
        for fn in (
            cbor_decode_one,
            lambda p: _Unpacker(p).value() if p else None,
            lambda p: decode_message([(1, "a", "varint")], p),
            lambda p: unframe_records(p),
            lambda p: walk_message(p),
            lambda p: SQLiteFile(p),
        ):
            try:
                fn(payload)
            except CLEAN:
                pass  # clean gates are the contract
            except (RecursionError, IndexError, KeyError, OverflowError,
                    MemoryError) as ex:  # noqa: PERF203
                pytest.fail(
                    f"unclean {type(ex).__name__} on trial {trial}: "
                    f"{payload[:40]!r}"
                )


def test_length_bomb_does_not_allocate():
    """A header CLAIMING a huge length over a tiny payload must raise
    on truncation, not attempt a giant allocation."""
    # cbor: bytes(2^32) claimed, 3 bytes present
    with pytest.raises(ValueError, match="truncated"):
        cbor_decode_one(b"\x5a\xff\xff\xff\xff" + b"abc")
    # msgpack: str32 claiming 4 GiB
    with pytest.raises(ValueError, match="truncated"):
        _Unpacker(b"\xdb\xff\xff\xff\xff" + b"abc").value()
    # protowire: LEN field claiming beyond the buffer
    with pytest.raises(ValueError, match="truncated"):
        decode_message([(1, "a", "bytes")], b"\x0a\xff\xff\xff\x0f" + b"x")


def test_protowire_negative_length_varint_does_not_hang():
    """A 10-byte varint with bit 63 set used as a LENGTH would, under
    two's-complement decoding, become negative and walk the cursor
    BACKWARDS — an infinite loop.  Lengths must reject bit-63 values.
    (ADVICE r11, medium: the two exact payloads that hung.)"""
    bomb = b"\xf5" + b"\xff" * 8 + b"\x01"
    with pytest.raises(ValueError, match="length|negative"):
        decode_message([(1, "a", "bytes")], b"\x0a" + bomb)
    with pytest.raises(ValueError, match="length|negative"):
        unframe_records(b"\xf6" + b"\xff" * 8 + b"\x01")
    # same bomb as an UNKNOWN LEN field's skip length
    with pytest.raises(ValueError, match="length|negative"):
        decode_message([(1, "a", "varint")], b"\x12" + bomb)
    # same bomb for string / packed / nested-message lengths
    with pytest.raises(ValueError, match="length|negative"):
        decode_message([(1, "a", "string")], b"\x0a" + bomb)
    with pytest.raises(ValueError, match="length|negative"):
        decode_message([(1, "a", ("packed_varint",))], b"\x0a" + bomb)
    with pytest.raises(ValueError, match="length|negative"):
        decode_message([(1, "a", ("message", []))], b"\x0a" + bomb)


def test_protowire_wire_type_mismatch_raises():
    """A tag whose wire type contradicts the declared field type must
    raise, not silently desynchronize the tag stream (ADVICE r11, low)."""
    # field 1 declared varint, sent as LEN (wt=2)
    with pytest.raises(ValueError, match="wire type"):
        decode_message([(1, "a", "varint")], b"\x0a\x01\x00")
    # field 1 declared sint64, sent as I64 (wt=1)
    with pytest.raises(ValueError, match="wire type"):
        decode_message([(1, "a", "sint64")], b"\x09" + b"\x00" * 8)
    # field 1 declared string, sent as varint (wt=0)
    with pytest.raises(ValueError, match="wire type"):
        decode_message([(1, "a", "string")], b"\x08\x05")
    # field 1 declared bytes, sent as I32 (wt=5)
    with pytest.raises(ValueError, match="wire type"):
        decode_message([(1, "a", "bytes")], b"\x0d" + b"\x00" * 4)
    # field 1 declared packed, sent as varint
    with pytest.raises(ValueError, match="wire type"):
        decode_message([(1, "a", ("packed_varint",))], b"\x08\x05")
    # field 1 declared message, sent as I64
    with pytest.raises(ValueError, match="wire type"):
        decode_message([(1, "a", ("message", []))], b"\x09" + b"\x00" * 8)
