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


def test_pax_and_gnu_longname_gate():
    p = bytearray(tar_build([("x.txt", b"abc")]))
    for flag in (b"x", b"g", b"L", b"K"):
        bad = bytearray(p)
        bad[156] = flag[0]
        # re-checksum so the gate (not the checksum) trips
        bad[148:156] = b" " * 8
        chk = sum(bad[:512])
        bad[148:156] = f"{chk:06o}\x00 ".encode()
        with pytest.raises(NotImplementedError, match="tar: extended"):
            tar_walk(bytes(bad))


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
