"""MessagePack codec (sources/msgpack.py): spec byte-vector pins (no
third-party msgpack library exists here, so the vectors ARE the
cross-check), round-trips under hypothesis, timestamp ext forms, and
error paths."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from national_caseload_data_ingest_spark.sources.msgpack import (
    msgpack_decode_rows,
    msgpack_encode_rows,
    pack_value,
    _Unpacker,
)


def _enc(v) -> bytes:
    out = bytearray()
    pack_value(out, v)
    return bytes(out)


def _dec(b: bytes):
    return _Unpacker(b).value()


# hand-derived from the public spec (format table in spec.md)
SPEC_VECTORS = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (128, b"\xcc\x80"),
    (255, b"\xcc\xff"),
    (256, b"\xcd\x01\x00"),
    (65535, b"\xcd\xff\xff"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (4294967295, b"\xce\xff\xff\xff\xff"),
    (4294967296, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (-33, b"\xd0\xdf"),
    (-128, b"\xd0\x80"),
    (-129, b"\xd1\xff\x7f"),
    (-32768, b"\xd1\x80\x00"),
    (-32769, b"\xd2\xff\xff\x7f\xff"),
    (-2147483648, b"\xd2\x80\x00\x00\x00"),
    (-2147483649, b"\xd3\xff\xff\xff\xff\x7f\xff\xff\xff"),
    (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ("", b"\xa0"),
    ("abc", b"\xa3abc"),
    ("a" * 31, b"\xbf" + b"a" * 31),
    ("a" * 32, b"\xd9\x20" + b"a" * 32),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, "a"], b"\x92\x01\xa1a"),
    ({}, b"\x80"),
    ({"k": 1}, b"\x81\xa1k\x01"),
]


@pytest.mark.parametrize("value,wire", SPEC_VECTORS)
def test_spec_byte_vectors(value, wire):
    assert _enc(value) == wire
    assert _dec(wire) == value


def test_long_str_and_bin_widths():
    s16 = "x" * 256
    assert _enc(s16)[:3] == b"\xda\x01\x00"
    assert _dec(_enc(s16)) == s16
    s32 = "x" * 65536
    assert _enc(s32)[:5] == b"\xdb\x00\x01\x00\x00"
    assert _dec(_enc(s32)) == s32
    b16 = bytes(300)
    assert _enc(b16)[:3] == b"\xc5\x01\x2c"
    assert _dec(_enc(b16)) == b16
    arr = list(range(20))
    assert _enc(arr)[:3] == b"\xdc\x00\x14"
    assert _dec(_enc(arr)) == arr


def test_timestamp_ext_forms():
    # ts32: whole seconds in u32 range -> fixext4
    t = pd.Timestamp(1700000000, unit="s")
    w = _enc(t)
    assert w == b"\xd6\xff" + (1700000000).to_bytes(4, "big")
    assert _dec(w) == t
    # ts64: fractional seconds -> fixext8, nanos<<34 | sec
    t = pd.Timestamp(1700000000 * 1_000_000_000 + 123456789, unit="ns")
    w = _enc(t)
    assert w[:2] == b"\xd7\xff"
    v = int.from_bytes(w[2:], "big")
    assert (v >> 34, v & ((1 << 34) - 1)) == (123456789, 1700000000)
    assert _dec(w) == t
    # ts96: pre-epoch -> ext8 length 12 with signed seconds (the only
    # ts96 trigger reachable via pandas: ns-backed Timestamps top out at
    # year 2262, far below the 2^34-second ts64 ceiling)
    t = pd.Timestamp("1969-12-31 23:59:58.5")
    w = _enc(t)
    assert w[:3] == b"\xc7\x0c\xff"
    assert _dec(w) == t
    # a hand-built ts96 wire form with sec >= 2^34 still DECODES
    # exactly into raw (sec, nsec) maths before the pandas clamp...
    # instead pin the decoder on a large-but-representable instant
    t = pd.Timestamp("2262-04-11 23:47:16.854775")
    sec, nsec = divmod(t.value, 1_000_000_000)
    w96 = b"\xc7\x0c\xff" + nsec.to_bytes(4, "big") \
        + sec.to_bytes(8, "big", signed=True)
    assert _dec(w96) == t


def test_error_paths():
    with pytest.raises(ValueError, match="truncated"):
        _dec(b"\xcd\x01")
    with pytest.raises(ValueError, match="reserved"):
        _dec(b"\xc1")
    with pytest.raises(NotImplementedError, match="ext type"):
        _dec(b"\xd4\x05\x00")  # fixext1 of unknown type 5
    with pytest.raises(ValueError, match="not an array"):
        msgpack_decode_rows(b"\xa1x")
    with pytest.raises(NotImplementedError, match="unsupported"):
        _enc(object())


def test_stream_roundtrip():
    rows = [(1, "a", None, 2.5), (2, "b", b"\x00", -7)]
    back = msgpack_decode_rows(msgpack_encode_rows(rows))
    assert back == [list(r) for r in rows]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**63), 2**64 - 1),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(st.none(), st.floats(allow_nan=False,
                                           allow_infinity=False)),
            st.one_of(st.none(), st.binary(max_size=40)),
            st.booleans(),
            st.lists(st.integers(-100, 100), max_size=4),
            st.dictionaries(st.text(max_size=5),
                            st.integers(-100, 100), max_size=3),
        ),
        max_size=15,
    )
)
def test_property_roundtrip(rows):
    back = msgpack_decode_rows(msgpack_encode_rows(rows))
    assert back == [list(r) for r in rows]


def test_distributed_roundtrip(spark):
    from national_caseload_data_ingest_spark.sources.msgpack import (
        decode_payloads,
        encode_partitions,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -2.0), (3, "c", None)],
        "id bigint, s string, v double",
    ).repartition(2)
    payloads = encode_partitions(df)
    back = decode_payloads(payloads, "id bigint, s string, v double")
    got = sorted((r.id, r.s, r.v) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, None, -2.0), (3, "c", None)]
