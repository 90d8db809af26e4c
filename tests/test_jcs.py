"""JCS canonicalization (sources/jcs.py): ES6 number layout rules,
minimal escaping, UTF-16 key ordering, and round-trip properties."""

from __future__ import annotations

import json
import random
import struct

import pytest

from national_caseload_data_ingest_spark.sources.jcs import (
    canonicalize,
    es6_number,
)


def test_es6_number_layout_rules():
    cases = {
        0.0: "0", -0.0: "0", 1.0: "1", -1.0: "-1", 0.5: "0.5",
        10.0: "10",
        1e20: "100000000000000000000",  # n == 21 boundary: plain
        1e21: "1e+21",                  # past it: exponential
        1.5e22: "1.5e+22",
        1e-6: "0.000001",               # n == -5 boundary: plain
        1e-7: "1e-7",                   # past it: exponential
        -2.5e-8: "-2.5e-8",
        123.456: "123.456",
        0.001: "0.001",
        3.141592653589793: "3.141592653589793",
        5e-324: "5e-324",               # min subnormal
        1.7976931348623157e308: "1.7976931348623157e+308",
    }
    for v, want in cases.items():
        assert es6_number(v) == want, v
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            es6_number(bad)


def test_es6_number_roundtrips_random_doubles():
    random.seed(20260816)
    for _ in range(50000):
        bits = random.getrandbits(64)
        v = struct.unpack(">d", bits.to_bytes(8, "big"))[0]
        if v != v or v in (float("inf"), float("-inf")):
            continue
        s = es6_number(v)
        assert float(s) == v, (v, s)
        # valid JSON number syntax (a 20-digit plain decimal parses as
        # int — numerically it may differ from the double by design of
        # shortest-round-trip, so compare through float)
        assert float(json.loads(s)) == v


def test_canonical_form():
    # sorted keys, no whitespace, literals
    assert canonicalize({"b": 1, "a": [True, False, None]}) \
        == '{"a":[true,false,null],"b":1}'
    # minimal escaping: named escapes + \\u00xx for other controls only
    assert canonicalize("x\n\t\x01é") == '"x\\n\\t\\u0001é"'
    assert canonicalize('q"\\') == '"q\\"\\\\"'
    # ints exact, floats via ES6
    assert canonicalize({"k": 2**60}) == f'{{"k":{2**60}}}'
    assert canonicalize(10.0) == "10"


def test_utf16_key_order():
    """RFC 8785 §3.2.3: keys sort by UTF-16 code units — the
    supplementary-plane char (surrogates D834 DF06) sorts BEFORE
    U+FF01, the opposite of code-point order."""
    got = canonicalize({"！": 1, "\U0001d306": 2})
    assert got.index("\U0001d306") < got.index("！")
    # BMP keys sort naturally
    assert canonicalize({"b": 1, "a": 2, "A": 3}) \
        == '{"A":3,"a":2,"b":1}'


def test_equivalent_wire_forms_collide():
    wires = [
        '{"a": 1.0e1, "b": "\\u0041"}',
        '{"b":"A","a":10}',
        '{ "b" : "\\u0041" , "a" : 1e1 }',
    ]
    canons = {canonicalize(json.loads(w)) for w in wires}
    assert canons == {'{"a":10,"b":"A"}'}
