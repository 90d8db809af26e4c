"""CBOR codec (sources/cbor.py): the RFC 8949 Appendix A example table
IS the cross-implementation check, plus indefinite-length decode,
timestamp tags, hypothesis round-trips, and error paths."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from national_caseload_data_ingest_spark.sources.cbor import (
    cbor_decode_one,
    cbor_decode_rows,
    cbor_encode,
    cbor_encode_rows,
)


def _enc(v) -> bytes:
    out = bytearray()
    cbor_encode(out, v)
    return bytes(out)


# RFC 8949 Appendix A (encode AND decode directions)
RFC_VECTORS = [
    (0, "00"),
    (1, "01"),
    (10, "0a"),
    (23, "17"),
    (24, "1818"),
    (25, "1819"),
    (100, "1864"),
    (1000, "1903e8"),
    (1000000, "1a000f4240"),
    (1000000000000, "1b000000e8d4a51000"),
    (18446744073709551615, "1bffffffffffffffff"),
    (-1, "20"),
    (-10, "29"),
    (-100, "3863"),
    (-1000, "3903e7"),
    (1.1, "fb3ff199999999999a"),
    (1.5, "f93e00"),
    (65504.0, "f97bff"),
    (100000.0, "fa47c35000"),
    (3.4028234663852886e38, "fa7f7fffff"),
    (1.0e300, "fb7e37e43c8800759c"),
    (5.960464477539063e-8, "f90001"),
    (0.00006103515625, "f90400"),
    (-4.0, "f9c400"),
    (-4.1, "fbc010666666666666"),
    (False, "f4"),
    (True, "f5"),
    (None, "f6"),
    (b"", "40"),
    (b"\x01\x02\x03\x04", "4401020304"),
    ("", "60"),
    ("a", "6161"),
    ("IETF", "6449455446"),
    ("ü", "62c3bc"),
    ("水", "63e6b0b4"),
    ([], "80"),
    ([1, 2, 3], "83010203"),
    ([1, [2, 3], [4, 5]], "8301820203820405"),
    (list(range(1, 26)),
     "98190102030405060708090a0b0c0d0e0f101112131415161718181819"),
    ({}, "a0"),
    ({1: 2, 3: 4}, "a201020304"),
    ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
    (["a", {"b": "c"}], "826161a161626163"),
]


@pytest.mark.parametrize("value,hexwire", RFC_VECTORS)
def test_rfc8949_appendix_a(value, hexwire):
    wire = bytes.fromhex(hexwire)
    assert _enc(value) == wire
    assert cbor_decode_one(wire) == value


def test_rfc8949_indefinite_length_decode():
    # (_ h'0102', h'030405')
    assert cbor_decode_one(bytes.fromhex("5f42010243030405ff")) \
        == b"\x01\x02\x03\x04\x05"
    # (_ "strea", "ming")
    assert cbor_decode_one(bytes.fromhex("7f657374726561646d696e67ff")) \
        == "streaming"
    # [_ 1, [2, 3], [_ 4, 5]]
    assert cbor_decode_one(bytes.fromhex("9f018202039f0405ffff")) \
        == [1, [2, 3], [4, 5]]
    # {_ "a": 1, "b": [_ 2, 3]}
    assert cbor_decode_one(bytes.fromhex("bf61610161629f0203ffff")) \
        == {"a": 1, "b": [2, 3]}
    # [_ ] empty indefinite array
    assert cbor_decode_one(bytes.fromhex("9fff")) == []


def test_nan_and_float_widths():
    assert _enc(float("nan")) == bytes.fromhex("f97e00")
    got = cbor_decode_one(bytes.fromhex("f97e00"))
    assert math.isnan(got)
    # 0.5 fits binary16; 0.1 needs binary64
    assert _enc(0.5)[0] == 0xF9
    assert _enc(0.1)[0] == 0xFB


def test_timestamp_tags():
    t = pd.Timestamp("2024-03-01 12:34:56.789123")
    w = _enc(t)
    assert w[0] == 0xC0  # tag 0
    assert cbor_decode_one(w) == t
    # tag 1 (epoch number) decodes, both int and float
    one = bytes.fromhex("c11a514b67b0")  # RFC: 1(1363896240)
    assert cbor_decode_one(one) == pd.Timestamp(1363896240, unit="s")
    half = bytes.fromhex("c1fb41d452d9ec200000")  # 1(1363896240.5)
    assert cbor_decode_one(half) == pd.Timestamp("2013-03-21 20:04:00.5")


def test_error_paths():
    with pytest.raises(ValueError, match="truncated"):
        cbor_decode_one(bytes.fromhex("1903"))
    with pytest.raises(ValueError, match="reserved additional info"):
        cbor_decode_one(bytes.fromhex("1c"))
    with pytest.raises(ValueError, match="break"):
        cbor_decode_one(bytes.fromhex("ff"))
    with pytest.raises(NotImplementedError, match="tag"):
        cbor_decode_one(bytes.fromhex("d82076"))  # tag 32 (URI)
    with pytest.raises(ValueError, match="trailing"):
        cbor_decode_one(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="not an array"):
        cbor_decode_rows(bytes.fromhex("00"))
    with pytest.raises(NotImplementedError, match="unsupported python"):
        _enc(object())
    with pytest.raises(ValueError, match="uint64 range"):
        _enc(1 << 64)


def test_stream_roundtrip():
    rows = [(1, "a", None, 2.5, b"\x00"), (-7, "", True, -0.5, b"zz")]
    assert cbor_decode_rows(cbor_encode_rows(rows)) \
        == [list(r) for r in rows]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(1 << 64), (1 << 64) - 1),
            st.one_of(st.none(), st.text(max_size=30)),
            st.one_of(st.none(),
                      st.floats(allow_nan=False)),
            st.one_of(st.none(), st.binary(max_size=30)),
            st.booleans(),
            st.lists(st.integers(-100, 100), max_size=4),
            st.dictionaries(st.text(max_size=4),
                            st.integers(-5, 5), max_size=3),
        ),
        max_size=12,
    )
)
def test_property_roundtrip(rows):
    back = cbor_decode_rows(cbor_encode_rows(rows))
    assert back == [list(r) for r in rows]


def test_distributed_roundtrip(spark):
    from national_caseload_data_ingest_spark.sources.cbor import (
        decode_payloads,
        encode_partitions,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -2.0), (3, "c", None)],
        "id bigint, s string, v double",
    ).repartition(2)
    back = decode_payloads(
        encode_partitions(df), "id bigint, s string, v double")
    got = sorted((r.id, r.s, r.v) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, None, -2.0), (3, "c", None)]
