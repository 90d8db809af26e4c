"""Protobuf wire format (sources/protowire.py): spec byte vectors,
zigzag, packed repeated, nested messages, unknown-field skipping,
framing, and error paths."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from national_caseload_data_ingest_spark.sources.protowire import (
    decode_message,
    encode_message,
    encode_unknown_field,
    frame_records,
    unframe_records,
    _unzigzag,
    _zigzag,
)

SIMPLE = [(1, "a", "varint"), (2, "b", "string")]


def test_spec_byte_vectors():
    # the encoding guide's canonical example: field 1 varint 150
    assert encode_message([(1, "a", "varint")], {"a": 150}) \
        == b"\x08\x96\x01"
    # field 2 string "testing"
    assert encode_message([(2, "b", "string")], {"b": "testing"}) \
        == b"\x12\x07testing"
    # zigzag table from the spec
    for n, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
                 (2147483647, 4294967294), (-2147483648, 4294967295)]:
        assert _zigzag(n) == z
        assert _unzigzag(z) == n
    # negative int64 varint occupies 10 bytes
    w = encode_message([(1, "a", "varint")], {"a": -2})
    assert len(w) == 11  # tag + 10-byte varint
    assert decode_message([(1, "a", "varint")], w)["a"] == -2


def test_packed_repeated_spec_example():
    # spec example: repeated int32 field 4, values 3, 270, 86942
    w = encode_message([(4, "d", ("packed_varint",))],
                       {"d": [3, 270, 86942]})
    assert w == b"\x22\x06\x03\x8e\x02\x9e\xa7\x05"
    assert decode_message([(4, "d", ("packed_varint",))], w)["d"] \
        == [3, 270, 86942]


def test_nested_message_and_missing_fields():
    inner = [(1, "sec", "varint"), (2, "nanos", "varint")]
    outer = [(1, "id", "varint"), (2, "ts", ("message", inner)),
             (3, "name", "string")]
    w = encode_message(outer, {"id": 7, "ts": {"sec": 1700000000,
                                               "nanos": 123}})
    back = decode_message(outer, w)
    assert back == {"id": 7, "ts": {"sec": 1700000000, "nanos": 123},
                    "name": None}


def test_unknown_fields_are_skipped_by_wire_type():
    known = [(1, "a", "varint")]
    # unknown varint, len, i64, i32 fields interleaved with a known one
    payload = (
        encode_unknown_field(99, 12345)
        + encode_message([(50, "x", "string")], {"x": "skipme"})
        + encode_message([(51, "y", "double")], {"y": 2.5})
        + encode_message([(52, "z", "float")], {"z": 1.0})
        + encode_message(known, {"a": 42})
    )
    assert decode_message(known, payload) == {"a": 42}


def test_last_one_wins_and_double_roundtrip():
    fields = [(1, "a", "varint"), (2, "v", "double")]
    w = encode_message(fields, {"a": 1}) + encode_message(fields, {"a": 9})
    assert decode_message(fields, w)["a"] == 9
    w = encode_message(fields, {"v": -0.1})
    assert decode_message(fields, w)["v"] == -0.1


def test_error_paths():
    with pytest.raises(ValueError, match="truncated varint"):
        decode_message(SIMPLE, b"\x08\x96")
    with pytest.raises(ValueError, match="truncated field"):
        decode_message(SIMPLE, b"\x12\x07test")
    # a group tag (wire type 3) on an unknown field cannot be skipped
    with pytest.raises(ValueError, match="wire type 3"):
        decode_message(SIMPLE, bytes([(9 << 3) | 3]))
    with pytest.raises(ValueError, match="over 10 bytes"):
        decode_message(SIMPLE, b"\x08" + b"\x80" * 11)


def test_framing_roundtrip():
    recs = [b"", b"a", b"x" * 300]
    assert unframe_records(frame_records(recs)) == recs


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries({
            "a": st.one_of(st.none(),
                           st.integers(-(2**63), 2**63 - 1)),
            "s": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            "t": st.one_of(st.none(), st.text(max_size=30)),
            "d": st.one_of(st.none(),
                           st.floats(allow_nan=False)),
            "p": st.lists(st.integers(0, 2**63 - 1), max_size=5),
        }),
        max_size=10,
    )
)
def test_property_roundtrip(rows):
    fields = [(1, "a", "varint"), (2, "s", "sint64"), (3, "t", "string"),
              (4, "d", "double"), (5, "p", ("packed_varint",))]
    framed = frame_records([encode_message(fields, r) for r in rows])
    back = [decode_message(fields, rec) for rec in unframe_records(framed)]
    assert back == [
        {**r, "p": r["p"]} for r in rows
    ]
