"""Native git reader (sources/gitobjects.py): every pack/loose fixture
in the cross-validation tests is written by the REAL git binary, so the
walker is checked against the canonical implementation; the encoder
twin's packs cover the delta opcodes deterministically."""

from __future__ import annotations

import os
import subprocess

import pytest

from national_caseload_data_ingest_spark.sources.gitobjects import (
    _apply_delta,
    build_pack,
    make_delta,
    object_id,
    parse_commit,
    parse_tree,
    read_loose,
    read_pack,
)


def _git(*args: str, cwd: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True,
        text=True,
        env={**os.environ,
             "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@x",
             "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@x",
             "GIT_AUTHOR_DATE": "1700000000 +0000",
             "GIT_COMMITTER_DATE": "1700000000 +0000"},
    ).stdout


@pytest.fixture()
def repo(tmp_path):
    d = str(tmp_path / "r")
    os.makedirs(d)
    _git("init", "-q", cwd=d)
    for i in range(3):
        with open(os.path.join(d, "f.txt"), "w") as f:
            f.write("line one\n" * 20 + f"revision {i}\n")
        with open(os.path.join(d, f"extra{i}.txt"), "w") as f:
            f.write(f"extra content {i}\n" * 10)
        _git("add", "-A", cwd=d)
        _git("commit", "-q", "-m", f"commit {i}", cwd=d)
    return d


def test_loose_objects_match_git(repo):
    head = _git("rev-parse", "HEAD", cwd=repo).strip()
    objdir = os.path.join(repo, ".git", "objects")
    n = 0
    for sub in os.listdir(objdir):
        if len(sub) != 2:
            continue
        for name in os.listdir(os.path.join(objdir, sub)):
            sha = sub + name
            with open(os.path.join(objdir, sub, name), "rb") as f:
                otype, body = read_loose(f.read())
            # our id computation must reproduce git's
            assert object_id(otype, body).hex() == sha
            assert otype == _git("cat-file", "-t", sha,
                                 cwd=repo).strip()
            n += 1
    assert n >= 9  # 3 commits + trees + blobs
    # the HEAD commit parses and names its tree exactly as git does
    with open(os.path.join(objdir, head[:2], head[2:]), "rb") as f:
        _t, body = read_loose(f.read())
    info = parse_commit(body)
    assert info["tree"].hex() == _git(
        "rev-parse", "HEAD^{tree}", cwd=repo).strip()
    assert info["message"].startswith("commit 2")


def test_real_git_pack_decodes(repo):
    """git gc packs the history (delta-compressing the revisions); the
    native walker must decode every object to the exact ids git
    reports."""
    _git("gc", "-q", "--aggressive", cwd=repo)
    packdir = os.path.join(repo, ".git", "objects", "pack")
    packs = [p for p in os.listdir(packdir) if p.endswith(".pack")]
    assert packs
    with open(os.path.join(packdir, packs[0]), "rb") as f:
        objs = read_pack(f.read())
    want = set()
    for line in _git("cat-file", "--batch-check", "--batch-all-objects",
                     cwd=repo).splitlines():
        sha, otype, _size = line.split()
        want.add((sha, otype))
    got = {(o["oid"].hex(), o["otype"]) for o in objs}
    assert got == want
    # trees parse; the HEAD tree lists our files
    head_tree = _git("rev-parse", "HEAD^{tree}", cwd=repo).strip()
    tree = next(o for o in objs if o["oid"].hex() == head_tree)
    names = {e["name"] for e in parse_tree(tree["body"])}
    assert {"f.txt", "extra0.txt", "extra1.txt", "extra2.txt"} <= names


def test_encoder_twin_roundtrip_and_guards():
    blob = b"x" * 300
    delta = make_delta(blob, b"-suffix")
    pack = build_pack([
        ("blob", blob),
        ("ofs_delta", 0, delta),
        ("ref_delta", 1, make_delta(blob + b"-suffix", b"!")),
    ])
    objs = read_pack(pack)
    assert objs[1]["body"] == blob + b"-suffix"
    assert objs[2]["body"] == blob + b"-suffix!"
    # checksum tamper is loud
    bad = bytearray(pack)
    bad[15] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        read_pack(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        read_pack(b"JUNK" + pack[4:])
    with pytest.raises(NotImplementedError, match="version"):
        read_pack(b"PACK\x00\x00\x00\x03" + pack[8:])


def test_delta_opcode_edges():
    base = bytes(range(256)) * 300  # 76800 bytes
    # copy with size bytes absent means 0x10000
    out = bytearray()

    def varint(n):
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    varint(len(base))
    varint(0x10000)
    out.append(0x80)  # copy, offset 0, size bytes absent -> 0x10000
    got = _apply_delta(base, bytes(out))
    assert got == base[:0x10000]
    # reserved opcode 0 raises
    out2 = bytearray()
    n = len(base)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out2.append(b | 0x80)
        else:
            out2.append(b)
            break
    out2 += b"\x01\x00"
    with pytest.raises(ValueError, match="reserved delta opcode"):
        _apply_delta(base, bytes(out2))
