"""ustar/WebDataset shard reader (operators/tarshard.py): header
grammar, checksum rule, block arithmetic, sample grouping."""

from __future__ import annotations

import io
import tarfile

import pytest

from national_caseload_data_ingest_spark.operators.tarshard import (
    _synth_shard,
    tar_build,
    tar_walk,
    wds_sample_key,
)


def test_walk_matches_stdlib_tarfile():
    """Cross-validation against an INDEPENDENT implementation: a shard
    written by our builder must parse identically under stdlib tarfile,
    and a shard written by stdlib tarfile must parse under our walker."""
    members = [("a.txt", b"hello"), ("dir/b.bin", bytes(range(200)))]
    ours = tar_build(members, mtime=123)
    with tarfile.open(fileobj=io.BytesIO(ours)) as tf:
        got = [(m.name, tf.extractfile(m).read(), m.mtime)
               for m in tf.getmembers()]
    assert got == [("a.txt", b"hello", 123), ("dir/b.bin", bytes(range(200)), 123)]

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 99
            tf.addfile(info, io.BytesIO(data))
    back = tar_walk(buf.getvalue())
    assert [(m["name"], m["data"], m["mtime"]) for m in back] == [
        ("a.txt", b"hello", 99), ("dir/b.bin", bytes(range(200)), 99)
    ]


def test_block_arithmetic_exact():
    """Member sizes at the 512-boundary edges: 0, 511, 512, 513."""
    members = [(f"m{i}.bin", bytes(n)) for i, n in
               enumerate((0, 511, 512, 513))]
    back = tar_walk(tar_build(members))
    assert [m["size"] for m in back] == [0, 511, 512, 513]
    assert all(m["data"] == bytes(m["size"]) for m in back)


def test_corruption_is_valueerror():
    p = bytearray(tar_build([("x.txt", b"abc")]))
    bad = bytearray(p)
    bad[260] ^= 0xFF  # magic
    with pytest.raises(ValueError, match="ustar magic"):
        tar_walk(bytes(bad))
    bad = bytearray(p)
    bad[0] ^= 0x01  # name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        tar_walk(bytes(bad))
    bad = bytearray(p)
    bad[124] = ord("9") + 1  # non-octal size; re-checksum to reach parse
    bad[148:156] = b" " * 8
    bad[148:156] = f"{sum(bad[:512]):06o}\x00 ".encode()
    with pytest.raises(ValueError, match="octal"):
        tar_walk(bytes(bad))
    with pytest.raises(ValueError, match="truncated member"):
        tar_walk(bytes(p[: 512 + 1]))
    with pytest.raises(ValueError, match="end-of-archive"):
        tar_walk(bytes(p[:1024]))  # header+data but no terminator
    with pytest.raises(ValueError, match="empty or truncated"):
        tar_walk(b"")


LONG = "deep/" + "/".join(f"dir{c * 30}" for c in "abcd") + "/sample-000042.txt"


def test_pax_longname_roundtrip_both_directions():
    """>100-byte names via PAX ``x`` headers: our builder's output parses
    under stdlib tarfile, and stdlib PAX_FORMAT output parses under our
    walker (cross-validation both ways, long names included)."""
    assert len(LONG.encode()) > 100
    ours = tar_build([(LONG, b"hello"), ("short.txt", b"x")],
                     mtime=7, longname="pax")
    with tarfile.open(fileobj=io.BytesIO(ours)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == [(LONG, b"hello"), ("short.txt", b"x")]

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as tf:
        info = tarfile.TarInfo(LONG)
        info.size = 5
        info.mtime = 55
        tf.addfile(info, io.BytesIO(b"world"))
    back = tar_walk(buf.getvalue())
    assert [(m["name"], m["data"], m["mtime"]) for m in back] == [
        (LONG, b"world", 55)]


def test_gnu_longname_roundtrip_both_directions():
    ours = tar_build([(LONG, b"hello")], mtime=7, longname="gnu")
    with tarfile.open(fileobj=io.BytesIO(ours)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == [(LONG, b"hello")]

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as tf:
        info = tarfile.TarInfo(LONG)
        info.size = 5
        tf.addfile(info, io.BytesIO(b"world"))
    back = tar_walk(buf.getvalue())
    assert [(m["name"], m["data"]) for m in back] == [(LONG, b"world")]


def test_gnu_long_linkname_via_stdlib():
    long_target = "t/" + "x" * 150
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as tf:
        info = tarfile.TarInfo("link.bin")
        info.type = tarfile.SYMTYPE
        info.linkname = long_target
        tf.addfile(info)
    back = tar_walk(buf.getvalue())
    assert [(m["name"], m["typeflag"], m["linkname"]) for m in back] == [
        ("link.bin", "2", long_target)]


def test_pax_global_header_applies_to_all_members():
    from national_caseload_data_ingest_spark.operators.tarshard import (
        _padded,
        _ustar_header,
        pax_record,
    )

    rec = pax_record("mtime", "1234.567")
    out = bytearray()
    out += _ustar_header(b"pax_global_header", len(rec), 0, "g")
    out += _padded(rec)
    out += tar_build([("a.txt", b"aa"), ("b.txt", b"bb")], mtime=9)
    back = tar_walk(bytes(out))
    # global mtime (seconds part) overrides the header field on BOTH
    assert [(m["name"], m["mtime"]) for m in back] == [
        ("a.txt", 1234), ("b.txt", 1234)]


def test_pax_x_overrides_gnu_l_overrides_header():
    from national_caseload_data_ingest_spark.operators.tarshard import (
        _padded,
        _ustar_header,
        pax_record,
    )

    # L header then x header: the x path record wins (POSIX precedence)
    out = bytearray()
    body = b"from-gnu-L\x00"
    out += _ustar_header(b"././@LongLink", len(body), 0, "L")
    out += _padded(body)
    rec = pax_record("path", "from-pax-x")
    out += _ustar_header(b"PaxHeader/m", len(rec), 0, "x")
    out += _padded(rec)
    out += tar_build([("header-name.txt", b"d")])
    back = tar_walk(bytes(out))
    assert back[0]["name"] == "from-pax-x"
    # and the override is consumed: the tar_build terminator already
    # ended the stream after one member
    assert len(back) == 1


def test_malformed_pax_and_dangling_extended_header_raise():
    p = bytearray(tar_build([("x.txt", b"abc")]))
    for flag in (b"x", b"g"):
        bad = bytearray(p)
        bad[156] = flag[0]
        bad[148:156] = b" " * 8
        chk = sum(bad[:512])
        bad[148:156] = f"{chk:06o}\x00 ".encode()
        # data "abc" is not a valid pax record stream
        with pytest.raises(ValueError, match="pax record"):
            tar_walk(bytes(bad))
    # a trailing L header with no member after it is structural damage
    bad = bytearray(p)
    bad[156] = ord("L")
    bad[148:156] = b" " * 8
    chk = sum(bad[:512])
    bad[148:156] = f"{chk:06o}\x00 ".encode()
    with pytest.raises(ValueError, match="dangling extended header"):
        tar_walk(bytes(bad))


def test_pax_record_self_counting_length():
    from national_caseload_data_ingest_spark.operators.tarshard import (
        _parse_pax,
        pax_record,
    )

    # boundary where the record length's digit count feeds back into it
    for val in ("a", "a" * 90, "a" * 91, "a" * 92, "a" * 993, "é" * 60):
        rec = pax_record("path", val)
        ln = int(rec.split(b" ", 1)[0])
        assert ln == len(rec)
        assert _parse_pax(rec) == {"path": val}
    multi = pax_record("path", "p") + pax_record("size", "5")
    assert _parse_pax(multi) == {"path": "p", "size": "5"}


def test_wds_key_convention():
    assert wds_sample_key("000123.jpg") == "000123"
    assert wds_sample_key("shard/000123.seg.png") == "000123"
    assert wds_sample_key("a/b/x") == "x"


@pytest.mark.parametrize("did", [0, 1, 6, 7, 13, 14])
def test_synth_shard_closed_form(did):
    members = tar_walk(_synth_shard(did))
    n_samples = 2 + did % 3
    want_members = 2 * n_samples - (1 if did % 7 == 0 else 0)
    assert len(members) == want_members
    keys = {wds_sample_key(m["name"]) for m in members}
    assert len(keys) == n_samples
    for m in members:
        if m["name"].endswith(".txt"):
            s = int(m["name"].split("-")[1].split(".")[0])
            ln = 32 + (did + s) % 32
            assert m["size"] == ln
            assert m["data"] == bytes(
                (did + s + k) % 64 + 32 for k in range(ln)
            )
