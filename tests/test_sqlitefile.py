"""Native SQLite reader (sources/sqlitefile.py): every byte decoded
here was written by the reference C library (stdlib sqlite3 +
Connection.serialize), so each test is a true cross-implementation
check."""

from __future__ import annotations

import sqlite3
import struct

import pytest

from national_caseload_data_ingest_spark.sources.sqlitefile import (
    MAGIC,
    SQLiteFile,
    _rowid_alias_index,
    _varint,
)


def _db(*ddl_and_rows, page_size=512):
    con = sqlite3.connect(":memory:")
    con.execute(f"PRAGMA page_size={page_size}")
    for stmt, rows in ddl_and_rows:
        con.execute(stmt)
        if rows:
            ph = ",".join("?" * len(rows[0]))
            table = stmt.split()[2]
            con.executemany(f"INSERT INTO {table} VALUES ({ph})", rows)
    con.commit()
    data = bytes(con.serialize())
    con.close()
    return data


def test_varint_forms():
    assert _varint(b"\x00", 0) == (0, 1)
    assert _varint(b"\x7f", 0) == (127, 1)
    assert _varint(b"\x81\x00", 0) == (128, 2)
    assert _varint(b"\x82\x2c", 0) == (300, 2)
    # 9-byte form: 8 continuation bytes then a full 8-bit byte
    nine = bytes([0xFF] * 8 + [0xFF])
    assert _varint(nine, 0) == (-1, 9)


def test_serial_types_roundtrip():
    rows = [
        (1, None, 0, 1, -1, 127, -128, 32767, 8388607, 2**31 - 1,
         2**47 - 1, 2**63 - 1, 1.5, "text", b"\x00\xff"),
        (2, None, 1, 0, -2**63, -127, 128, -32768, -8388608, -(2**31),
         -(2**47), -(2**63) + 1, -0.25, "", b""),
    ]
    data = _db((
        "CREATE TABLE t (k INTEGER PRIMARY KEY, a, b, c, d, e, f, g, "
        "h, i, j, l, m REAL, s TEXT, z BLOB)", rows))
    got = SQLiteFile(data).read_table("t")
    assert got == rows


def test_interior_pages_and_rowid_order():
    rows = [(i, f"name-{i:05d}") for i in range(1, 2001)]
    # insert shuffled; the b-tree walk must return rowid order
    shuffled = rows[::2] + rows[1::2]
    data = _db(("CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT)",
                shuffled))
    f = SQLiteFile(data)
    assert f.read_table("t") == rows
    # 2000 rows on 512-byte pages cannot fit one leaf: interior walked
    root = f.tables()["t"]["rootpage"]
    assert f._page(root)[0] == 0x05


def test_overflow_chains():
    long = "y" * 5000  # many overflow pages at 512-byte page size
    rows = [(1, long), (2, "short"), (3, "z" * 600)]
    data = _db(("CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT)", rows))
    assert SQLiteFile(data).read_table("t") == rows


def test_no_rowid_alias_when_plain_integer():
    rows = [(10, "a"), (20, "b")]
    data = _db(("CREATE TABLE t (k INTEGER, s TEXT)", rows))
    assert SQLiteFile(data).read_table("t") == rows


def test_rowid_alias_parse():
    assert _rowid_alias_index(
        "CREATE TABLE t (a TEXT, b INTEGER PRIMARY KEY, c)") == 1
    assert _rowid_alias_index("CREATE TABLE t (a INTEGER, b)") is None
    # type must be exactly INTEGER for the alias rule
    assert _rowid_alias_index("CREATE TABLE t (a INT PRIMARY KEY)") is None
    # parenthesized constraints don't split columns
    assert _rowid_alias_index(
        "CREATE TABLE t (a TEXT CHECK (a IN ('x','y')), "
        "b INTEGER PRIMARY KEY)") == 1


def test_multiple_tables_and_catalog():
    data = _db(
        ("CREATE TABLE a (k INTEGER PRIMARY KEY, v TEXT)", [(1, "x")]),
        ("CREATE TABLE b (k INTEGER PRIMARY KEY, n INTEGER)", [(5, 50)]),
    )
    f = SQLiteFile(data)
    assert set(f.tables()) == {"a", "b"}
    assert f.read_table("a") == [(1, "x")]
    assert f.read_table("b") == [(5, 50)]
    with pytest.raises(ValueError, match="no such table"):
        f.read_table("missing")


def test_gates_are_loud():
    data = _db(("CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT)",
                [(1, "x")]))
    with pytest.raises(ValueError, match="bad magic"):
        SQLiteFile(b"not a database" + data[14:])
    # WAL mode gate (flip the read/write version bytes)
    bad = bytearray(data)
    bad[18] = bad[19] = 2
    with pytest.raises(NotImplementedError, match="WAL"):
        SQLiteFile(bytes(bad))
    # invalid text-encoding id
    bad = bytearray(data)
    struct.pack_into(">I", bad, 56, 5)
    with pytest.raises(ValueError, match="encoding"):
        SQLiteFile(bytes(bad))


def test_without_rowid_tables_read_via_index_btrees():
    """WITHOUT ROWID storage: index b-trees (interior cells CARRY
    keys), the index spill formula, and the PK-first key-record
    permutation — all cross-checked against the C library."""
    # single-column PK, big values (multi-level tree + overflow)
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE w (k TEXT PRIMARY KEY, v TEXT, n INTEGER)"
                " WITHOUT ROWID")
    con.executemany("INSERT INTO w VALUES (?,?,?)", [
        (f"key{i:04d}", f"value {i} " * 40, i * 7) for i in range(300)])
    con.commit()
    got = SQLiteFile(bytes(con.serialize())).read_table("w")
    want = [tuple(r) for r in con.execute("SELECT * FROM w ORDER BY k")]
    assert got == want
    # composite TABLE-LEVEL PK whose order differs from declaration:
    # the stored record is (b, a, c); the reader must un-permute
    con2 = sqlite3.connect(":memory:")
    con2.execute("PRAGMA page_size=512")
    con2.execute("CREATE TABLE c (a INTEGER, b TEXT, c REAL, "
                 "PRIMARY KEY (b, a)) WITHOUT ROWID")
    con2.executemany("INSERT INTO c VALUES (?,?,?)", [
        (i, f"t{i % 17:03d}", i * 0.25) for i in range(200)])
    con2.commit()
    got2 = SQLiteFile(bytes(con2.serialize())).read_table("c")
    want2 = [tuple(r)
             for r in con2.execute("SELECT * FROM c ORDER BY b, a")]
    assert got2 == want2


def test_utf16_text_encodings():
    """UTF-16le / UTF-16be databases decode text cells through the
    header's declared codec (non-ASCII chars are load-bearing)."""
    for encname in ("UTF-16le", "UTF-16be"):
        con = sqlite3.connect(":memory:")
        con.execute(f"PRAGMA encoding='{encname}'")
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT)")
        con.executemany("INSERT INTO t VALUES (?,?)", [
            (i, f"héllo wörld {i} ∆") for i in range(50)])
        con.commit()
        got = SQLiteFile(bytes(con.serialize())).read_table("t")
        want = [tuple(r)
                for r in con.execute("SELECT * FROM t ORDER BY rowid")]
        assert got == want, encname


def _wal_db(tmp_path, n=200, page_size=512, extra_commit=True):
    """A WAL-mode database with the checkpoint WITHHELD: rows live
    only in the -wal sidecar, the main file is the pristine header."""
    path = str(tmp_path / "w.db")
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT, x REAL)")
    con.executemany("INSERT INTO t VALUES (?,?,?)",
                    [(i, f"row {i} " * 20, i * 0.5) for i in range(n)])
    con.commit()
    if extra_commit:
        con.execute("UPDATE t SET v = 'updated ' || k WHERE k % 7 = 0")
        con.commit()
    want = [tuple(r) for r in con.execute("SELECT * FROM t ORDER BY rowid")]
    with open(path, "rb") as f:
        main = f.read()
    with open(path + "-wal", "rb") as f:
        wal = f.read()
    con.close()
    return main, wal, want


def test_wal_sidecar_merge_matches_live_connection(tmp_path):
    """Checkpoint-withheld WAL database: the main file holds only the
    pristine page 1; every row must come from replaying the sidecar,
    with the second commit's updated frames winning."""
    main, wal, want = _wal_db(tmp_path)
    assert len(main) == 512  # truly checkpoint-withheld
    got = SQLiteFile(main, wal=wal).read_table("t")
    assert got == want
    # without the sidecar, the honest gate still trips
    with pytest.raises(NotImplementedError, match="WAL"):
        SQLiteFile(main)


def test_wal_torn_tail_rolls_back_to_last_commit(tmp_path):
    """Corrupting a frame in the SECOND commit must invalidate the
    cumulative checksum chain from that point: the reader sees exactly
    the FIRST commit's state (crash-recovery semantics)."""
    main, wal, _want = _wal_db(tmp_path, extra_commit=False)
    rows_c1 = SQLiteFile(main, wal=wal).read_table("t")
    sub = tmp_path / "sub"
    sub.mkdir()
    main2, wal2, want2 = _wal_db(sub, extra_commit=True)
    assert len(wal2) > len(wal)
    # flip one byte in the page content of the first frame AFTER the
    # first commit's span
    torn = bytearray(wal2)
    torn[len(wal) + 30] ^= 0xFF
    got = SQLiteFile(main2, wal=bytes(torn)).read_table("t")
    assert got == rows_c1  # first commit intact, second discarded
    assert got != want2
    # untampered: both commits visible
    assert SQLiteFile(main2, wal=wal2).read_table("t") == want2


def test_wal_salt_mismatch_ends_replay(tmp_path):
    main, wal, want = _wal_db(tmp_path, extra_commit=False)
    tampered = bytearray(wal)
    # find the second frame header and break its salt-1
    frame = 24 + 512
    second = 32 + frame
    tampered[second + 8] ^= 0xFF
    got_pages_before = SQLiteFile(main, wal=wal).read_table("t")
    assert got_pages_before == want
    from national_caseload_data_ingest_spark.sources.sqlitefile import (
        parse_wal,
    )
    # replay stops at the salt mismatch → nothing committed
    assert parse_wal(bytes(tampered), 512) == {}


def test_wal_header_guards(tmp_path):
    main, wal, _want = _wal_db(tmp_path, extra_commit=False)
    from national_caseload_data_ingest_spark.sources.sqlitefile import (
        parse_wal,
    )
    assert parse_wal(b"", 512) == {}  # empty sidecar = no frames
    with pytest.raises(ValueError, match="truncated WAL"):
        parse_wal(wal[:16], 512)
    with pytest.raises(ValueError, match="WAL magic"):
        parse_wal(b"\x00" * 32, 512)
    with pytest.raises(ValueError, match="page size"):
        parse_wal(wal, 1024)
    hdr_bad = bytearray(wal)
    hdr_bad[24] ^= 0xFF  # header checksum field
    with pytest.raises(ValueError, match="header checksum"):
        parse_wal(bytes(hdr_bad), 512)


def test_page_size_65536_encoding():
    data = _db(("CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT)",
                [(1, "x")]), page_size=65536)
    f = SQLiteFile(data)
    assert f.page_size == 65536
    assert struct.unpack_from(">H", data, 16)[0] == 1  # spec: 1 = 64KiB
    assert f.read_table("t") == [(1, "x")]


def test_header_magic_constant():
    assert MAGIC == b"SQLite format 3\x00"
