"""JSON Canonicalization Scheme (RFC 8785) — pure stdlib.

Two JSON texts that differ only in key order, whitespace, escaping
style, or float rendering are the SAME document; exact dedup over JSON
corpora therefore hashes the CANONICAL form, not the wire bytes.  JCS
defines that form:

* object members sorted by the key's UTF-16 code units (§3.2.3 — NOT
  code points: a supplementary-plane key sorts by its surrogate pair,
  so U+1D306 < U+FF01);
* minimal string escaping (§3.2.2.2): ``\\" \\\\ \\b \\f \\n \\r \\t``,
  all other control characters as lowercase ``\\u00xx``, everything
  else literal;
* numbers in ECMAScript ``Number::toString`` shortest form (§3.2.2.3):
  shortest digit string that round-trips (Python ``repr`` supplies it —
  CPython uses the same shortest-round-trip algorithm as the JS
  engines), re-rendered by the ES6 layout rules: plain decimal within
  10^-6 ≤ |x| < 10^21, exponential (``e+21``-style, no leading zeros in
  the exponent) outside, ``-0`` serializes as ``0``;
* no whitespace; arrays in order; ``true/false/null`` literals.

NaN and infinities are not JSON (RFC 8785 §3.2.2.3 forbids them) —
they raise.  Integers are rendered through the same float path iff they
came in as floats; Python ints serialize as exact decimals (JSON has no
int/float distinction; callers feeding ints beyond 2^53 get exact text,
matching big-integer JSON practice).
"""

from __future__ import annotations

_ESCAPES = {
    '"': '\\"', "\\": "\\\\", "\b": "\\b", "\f": "\\f",
    "\n": "\\n", "\r": "\\r", "\t": "\\t",
}


def _string(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ch < " ":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def es6_number(v: float) -> str:
    """ECMAScript Number::toString(10) of a finite double."""
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError("jcs: NaN/Infinity are not JSON numbers")
    if v == 0:
        return "0"  # covers -0.0 per the spec
    sign = "-" if v < 0 else ""
    # shortest round-trip digits via repr: 'd.ddd', 'ddd.d', 'de+XX'...
    r = repr(abs(v))
    if "e" in r or "E" in r:
        mant, _, exp = r.lower().partition("e")
        e10 = int(exp)
    else:
        mant, e10 = r, 0
    int_part, _, frac_part = mant.partition(".")
    digits = (int_part + frac_part).lstrip("0")
    # n: value = 0.digits * 10^n  (ES6 spec's k-n decomposition)
    n = len(int_part.lstrip("0")) + e10 if int_part.strip("0") else (
        e10 - (len(frac_part) - len(frac_part.lstrip("0")))
    )
    digits = digits.rstrip("0") or "0"
    k = len(digits)
    if k <= n <= 21:
        return sign + digits + "0" * (n - k)
    if 0 < n <= 21:
        return sign + digits[:n] + "." + digits[n:]
    if -6 < n <= 0:
        return sign + "0." + "0" * (-n) + digits
    # exponential form
    e = n - 1
    mant_s = digits[0] + ("." + digits[1:] if k > 1 else "")
    return f"{sign}{mant_s}e{'+' if e >= 0 else '-'}{abs(e)}"


def canonicalize(v) -> str:
    """Value tree → canonical JSON text (RFC 8785)."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return _string(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return es6_number(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canonicalize(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(
            v.items(),
            key=lambda kv: [ord(c) for c in _utf16_units(kv[0])],
        )
        return "{" + ",".join(
            _string(k) + ":" + canonicalize(val) for k, val in items
        ) + "}"
    raise NotImplementedError(f"jcs: unsupported type {type(v).__name__}")


def _utf16_units(s: str) -> str:
    """The string re-expressed so python's per-char ordering equals
    UTF-16 code-unit ordering: supplementary-plane chars become their
    surrogate pairs."""
    out = []
    for ch in s:
        cp = ord(ch)
        if cp >= 0x10000:
            cp -= 0x10000
            out.append(chr(0xD800 | (cp >> 10)))
            out.append(chr(0xDC00 | (cp & 0x3FF)))
        else:
            out.append(ch)
    return "".join(out)
