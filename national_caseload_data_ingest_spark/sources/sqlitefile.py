"""Native SQLite database-file reader — pure stdlib, from the public
file-format specification (sqlite.org/fileformat2.html).

Real corpora ship metadata, annotations, and whole datasets as SQLite
files (single-file, zero-dependency, the most deployed database format
on earth); a Spark pipeline that can scan them WITHOUT a per-executor
sqlite3 round-trip through temp files reads the bytes directly, like
any other container codec in this engine.  Implemented:

* the 100-byte header (magic, page size incl. the 65536 encoding,
  usable-size reserve, all three text encodings — UTF-8, UTF-16le,
  UTF-16be);
* table b-trees: leaf (0x0D) and interior (0x05) pages, cell pointer
  arrays, depth-first in-rowid-order walks;
* INDEX b-trees: leaf (0x0A) and interior (0x02) pages — interior
  cells CARRY keys (in-order traversal interleaves children and cell
  payloads), with the index spill limit ((U-12)·64/255)-23; this is
  the storage of WITHOUT ROWID tables, whose key records hold PRIMARY
  KEY columns first and are un-permuted back to declared order
  (column-level and composite table-level PK forms);
* the record format: header-length varint, serial-type varints, and
  every serial type (NULL, 1/2/3/4/6/8-byte big-endian signed ints,
  float64, the constant 0/1 types 8-9, blob ≥12 even, text ≥13 odd);
* SQLite's 9-byte big-endian varints (the 9th byte carries 8 bits);
* OVERFLOW PAGE CHAINS, with the spec's exact spill arithmetic
  (X = U-35, M = ((U-12)·32/255)-23, K = M + (P-M) mod (U-4));
* the ``INTEGER PRIMARY KEY`` rowid-alias rule: such a column stores
  NULL in the record and takes the cell's rowid on read;
* the ``sqlite_master`` catalog on page 1 (its b-tree starts after the
  file header) — tables are located by name through it.

* **WAL mode**: a WAL-format database (read/write version 2) decodes
  when the ``-wal`` sidecar bytes are passed alongside — the 32-byte
  WAL header (magic 0x377F0682/3 selecting checksum word endianness,
  page size, salts, header checksum) validates, then frames replay in
  order with the spec's CUMULATIVE checksum chain and salt match;
  frames after the first invalid one are ignored, uncommitted trailing
  frames are discarded, and for each page the LATEST frame at or
  before the last valid commit wins over the main file's page.

Honest gates: WAL-mode files WITHOUT their sidecar raise
``NotImplementedError``; structural damage (bad magic, bad page type,
invalid encoding ids, truncated payloads, WAL salt/size mismatches)
raises ``ValueError``.

The ENCODE twin is stdlib ``sqlite3`` itself (``Connection.serialize``)
— which makes every test a true cross-implementation check: bytes
produced by the reference C library must decode identically here.

Spark shape: the established per-payload Arrow kernel (one ``binary``
column in, rows out) — one task per database file, zero shuffle.
"""

from __future__ import annotations

import struct

MAGIC = b"SQLite format 3\x00"


def _varint(d: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: up to 8 high-bit-continued bytes, 9th byte uses
    all 8 bits.  Returns (value, new_pos)."""
    n = 0
    for i in range(8):
        b = d[pos + i]
        n = (n << 7) | (b & 0x7F)
        if not b & 0x80:
            return n, pos + i + 1
    n = (n << 8) | d[pos + 8]
    # 64-bit two's complement
    if n >= 1 << 63:
        n -= 1 << 64
    return n, pos + 9


_WAL_MAGIC_LE = 0x377F0682  # little-endian checksum words
_WAL_MAGIC_BE = 0x377F0683


def _wal_cksum(data: bytes, s1: int, s2: int,
               big: bool) -> tuple[int, int]:
    """The WAL checksum: 32-bit words (endianness from the magic),
    pairwise ``s1 += x[i] + s2; s2 += x[i+1] + s1`` mod 2^32."""
    n = len(data) // 4
    words = struct.unpack((">" if big else "<") + f"{n}I", data[: 4 * n])
    for i in range(0, n, 2):
        s1 = (s1 + words[i] + s2) & 0xFFFFFFFF
        s2 = (s2 + words[i + 1] + s1) & 0xFFFFFFFF
    return s1, s2


def parse_wal(wal: bytes, page_size: int) -> dict[int, bytes]:
    """Replay a ``-wal`` sidecar → {page_number: page_bytes} for the
    pages covered by COMMITTED frames (latest commit wins).  Salt and
    cumulative-checksum validation follow the spec exactly: the first
    invalid frame ends the replay (a torn tail is normal after a
    crash), and frames after the last valid commit are discarded."""
    if not wal:
        return {}
    if len(wal) < 32:
        raise ValueError("sqlite: truncated WAL header")
    (magic, version, wpage, _ckpt_seq, salt1, salt2, ck1,
     ck2) = struct.unpack(">8I", wal[:32])
    if magic not in (_WAL_MAGIC_LE, _WAL_MAGIC_BE):
        raise ValueError(f"sqlite: bad WAL magic 0x{magic:08x}")
    big = magic == _WAL_MAGIC_BE
    if version != 3007000:
        raise NotImplementedError(f"sqlite: WAL version {version}")
    if wpage != page_size:
        raise ValueError(
            f"sqlite: WAL page size {wpage} != database {page_size}")
    if _wal_cksum(wal[:24], 0, 0, big) != (ck1, ck2):
        raise ValueError("sqlite: WAL header checksum mismatch")
    pages: dict[int, bytes] = {}
    pending: dict[int, bytes] = {}
    s1, s2 = ck1, ck2
    pos = 32
    frame = 24 + page_size
    while pos + frame <= len(wal):
        (pgno, commit_size, fsalt1, fsalt2, c1, c2) = struct.unpack(
            ">6I", wal[pos : pos + 24])
        if (fsalt1, fsalt2) != (salt1, salt2):
            break  # frame from a previous WAL generation
        content = wal[pos + 24 : pos + frame]
        s1, s2 = _wal_cksum(wal[pos : pos + 8], s1, s2, big)
        s1, s2 = _wal_cksum(content, s1, s2, big)
        if (s1, s2) != (c1, c2):
            break  # torn/corrupt tail: everything from here is dead
        pending[pgno] = content
        if commit_size:  # a commit frame publishes the batch
            pages.update(pending)
            pending.clear()
        pos += frame
    return pages


class SQLiteFile:
    def __init__(self, data: bytes, wal: bytes | None = None):
        self.d = data
        if data[:16] != MAGIC:
            raise ValueError("sqlite: bad magic")
        page_size = struct.unpack_from(">H", data, 16)[0]
        self.page_size = 65536 if page_size == 1 else page_size
        # read/write version 2 = WAL — the -wal sidecar may hold newer
        # pages, so decoding the main file alone would be silently stale
        if (data[18] != 1 or data[19] != 1) and wal is None:
            raise NotImplementedError(
                "sqlite: WAL-mode file; pass the -wal sidecar bytes "
                "(SQLiteFile(db, wal=...)) or checkpoint first"
            )
        self._wal_pages = (parse_wal(wal, self.page_size)
                           if wal is not None else {})
        # header fields beyond the page size come from the MERGED
        # page 1: a checkpoint-withheld WAL database's main file still
        # carries the pristine pre-schema header (encoding unset)
        hdr = self._wal_pages.get(1, data)[:100]
        if hdr[:16] != MAGIC:
            raise ValueError("sqlite: bad magic on merged page 1")
        reserve = hdr[20]
        self.usable = self.page_size - reserve
        enc = struct.unpack_from(">I", hdr, 56)[0]
        codecs = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}
        if enc not in codecs:
            raise ValueError(f"sqlite: invalid text encoding {enc}")
        self._text_codec = codecs[enc]

    def _page(self, number: int) -> bytes:
        got = self._wal_pages.get(number)
        if got is not None:
            return got
        start = (number - 1) * self.page_size
        out = self.d[start : start + self.page_size]
        if len(out) != self.page_size:
            raise ValueError(f"sqlite: truncated page {number}")
        return out

    # -- record format ------------------------------------------------

    def _record(self, payload: bytes) -> list:
        hdr_len, pos = _varint(payload, 0)
        serials = []
        while pos < hdr_len:
            st, pos = _varint(payload, pos)
            serials.append(st)
        if pos != hdr_len:
            raise ValueError("sqlite: record header length mismatch")
        out = []
        for st in serials:
            if st == 0:
                out.append(None)
            elif st in (1, 2, 3, 4, 6):
                width = {1: 1, 2: 2, 3: 3, 4: 4, 6: 8}[st]
                out.append(int.from_bytes(
                    payload[pos : pos + width], "big", signed=True))
                pos += width
            elif st == 5:
                out.append(int.from_bytes(
                    payload[pos : pos + 6], "big", signed=True))
                pos += 6
            elif st == 7:
                out.append(struct.unpack_from(">d", payload, pos)[0])
                pos += 8
            elif st == 8:
                out.append(0)
            elif st == 9:
                out.append(1)
            elif st >= 12 and st % 2 == 0:
                n = (st - 12) // 2
                out.append(payload[pos : pos + n])
                pos += n
            elif st >= 13:
                n = (st - 13) // 2
                out.append(payload[pos : pos + n].decode(
                    self._text_codec))
                pos += n
            else:
                raise ValueError(f"sqlite: reserved serial type {st}")
        return out

    # -- b-tree walk ---------------------------------------------------

    def _payload_at(self, page: bytes, pos: int, p_len: int,
                    x: int) -> bytes:
        """Payload starting at ``pos``, following the overflow chain
        when ``p_len`` exceeds the in-page limit ``x`` (the spec's
        spill arithmetic; ``x`` differs between table and index
        pages)."""
        u = self.usable
        if p_len <= x:
            return page[pos : pos + p_len]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (p_len - m) % (u - 4)
        inline = k if k <= x else m
        body = bytearray(page[pos : pos + inline])
        nxt = struct.unpack_from(">I", page, pos + inline)[0]
        while nxt:
            op = self._page(nxt)
            nxt = struct.unpack_from(">I", op, 0)[0]
            body += op[4 : 4 + min(u - 4, p_len - len(body))]
        if len(body) != p_len:
            raise ValueError("sqlite: overflow chain shorter than payload")
        return bytes(body)

    def _cell_payload(self, page: bytes, off: int) -> tuple[int, bytes]:
        """Table-leaf cell at ``off`` → (rowid, full payload incl. any
        overflow chain)."""
        p_len, pos = _varint(page, off)
        rowid, pos = _varint(page, pos)
        return rowid, self._payload_at(page, pos, p_len,
                                       self.usable - 35)

    def _index_payload(self, page: bytes, off: int) -> bytes:
        """Index cell key payload at ``off`` (no rowid field; the
        in-page limit is the INDEX formula ((U-12)·64/255)-23)."""
        p_len, pos = _varint(page, off)
        x = ((self.usable - 12) * 64) // 255 - 23
        return self._payload_at(page, pos, p_len, x)

    def _walk_table(self, page_no: int):
        """Depth-first table b-tree walk → (rowid, record values)."""
        page = self._page(page_no)
        # page 1 carries the 100-byte file header before the b-tree page
        hdr_off = 100 if page_no == 1 else 0
        ptype = page[hdr_off]
        ncells = struct.unpack_from(">H", page, hdr_off + 3)[0]
        if ptype == 0x05:  # interior table page
            ptr_array = hdr_off + 12
            for i in range(ncells):
                cell = struct.unpack_from(">H", page, ptr_array + 2 * i)[0]
                child = struct.unpack_from(">I", page, cell)[0]
                yield from self._walk_table(child)
            right = struct.unpack_from(">I", page, hdr_off + 8)[0]
            yield from self._walk_table(right)
        elif ptype == 0x0D:  # leaf table page
            ptr_array = hdr_off + 8
            for i in range(ncells):
                cell = struct.unpack_from(">H", page, ptr_array + 2 * i)[0]
                rowid, payload = self._cell_payload(page, cell)
                yield rowid, self._record(payload)
        elif ptype in (0x02, 0x0A):
            raise ValueError(
                "sqlite: index b-tree page in a TABLE walk (corrupt "
                "rootpage, or a WITHOUT ROWID table routed wrong)"
            )
        else:
            raise ValueError(f"sqlite: bad b-tree page type 0x{ptype:02x}")

    def _walk_index(self, page_no: int):
        """Depth-first INDEX b-tree walk → key records in key order.
        Unlike table b-trees, interior index cells CARRY keys that are
        part of the result set (they are not repeated in leaves), so
        the in-order traversal interleaves children and cell
        payloads."""
        page = self._page(page_no)
        hdr_off = 100 if page_no == 1 else 0
        ptype = page[hdr_off]
        ncells = struct.unpack_from(">H", page, hdr_off + 3)[0]
        if ptype == 0x02:  # interior index page
            ptr_array = hdr_off + 12
            for i in range(ncells):
                cell = struct.unpack_from(">H", page, ptr_array + 2 * i)[0]
                child = struct.unpack_from(">I", page, cell)[0]
                yield from self._walk_index(child)
                yield self._record(self._index_payload(page, cell + 4))
            right = struct.unpack_from(">I", page, hdr_off + 8)[0]
            yield from self._walk_index(right)
        elif ptype == 0x0A:  # leaf index page
            ptr_array = hdr_off + 8
            for i in range(ncells):
                cell = struct.unpack_from(">H", page, ptr_array + 2 * i)[0]
                yield self._record(self._index_payload(page, cell))
        elif ptype in (0x05, 0x0D):
            raise ValueError(
                "sqlite: table b-tree page in an INDEX walk")
        else:
            raise ValueError(f"sqlite: bad b-tree page type 0x{ptype:02x}")

    # -- catalog --------------------------------------------------------

    def tables(self) -> dict[str, dict]:
        """sqlite_master: name → {"rootpage", "sql"} for ordinary
        tables."""
        out = {}
        for _rowid, rec in self._walk_table(1):
            typ, name, _tbl, rootpage, sql = rec[:5]
            if typ == "table":
                out[name] = {"rootpage": rootpage, "sql": sql or ""}
        return out

    def read_table(self, name: str) -> list[tuple]:
        """All rows of ``name`` — rowid order for ordinary tables, PK
        order for WITHOUT ROWID tables.  An INTEGER PRIMARY KEY column
        (the rowid alias) stores NULL in the record and takes the
        cell's rowid; a WITHOUT ROWID table stores each row as an
        index-b-tree KEY record with PRIMARY KEY columns first, so the
        values are un-permuted back to declared order (both per the
        spec)."""
        cat = self.tables()
        if name not in cat:
            raise ValueError(f"sqlite: no such table {name!r}")
        create_sql = cat[name]["sql"]
        if "WITHOUT ROWID" in create_sql.upper():
            cols = _split_columns(create_sql)
            names = [c.strip().split()[0].strip('"').lower()
                     for c in cols
                     if c.strip() and not _is_table_constraint(c)]
            pk = _pk_column_indexes(create_sql, names)
            order = pk + [i for i in range(len(names)) if i not in pk]
            rows = []
            for rec in self._walk_index(cat[name]["rootpage"]):
                out = [None] * len(names)
                for stored, decl in enumerate(order):
                    if stored < len(rec):
                        out[decl] = rec[stored]
                rows.append(tuple(out))
            return rows
        alias_idx = _rowid_alias_index(create_sql)
        rows = []
        for rowid, rec in self._walk_table(cat[name]["rootpage"]):
            if alias_idx is not None and alias_idx < len(rec) \
                    and rec[alias_idx] is None:
                rec = list(rec)
                rec[alias_idx] = rowid
            rows.append(tuple(rec))
        return rows


def _split_columns(create_sql: str) -> list[str]:
    """Top-level comma split of the CREATE TABLE body (parens nest)."""
    open_p = create_sql.find("(")
    if open_p < 0:
        return []
    body = create_sql[open_p + 1 : create_sql.rfind(")")]
    depth = 0
    cols: list[str] = []
    cur: list[str] = []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    return cols


_CONSTRAINT_LEADS = ("PRIMARY", "UNIQUE", "CHECK", "FOREIGN",
                     "CONSTRAINT")


def _is_table_constraint(col: str) -> bool:
    return col.strip().upper().split()[:1] in (
        [[w] for w in _CONSTRAINT_LEADS])


def _pk_column_indexes(create_sql: str, names: list[str]) -> list[int]:
    """Declared-order indexes of the PRIMARY KEY columns, in PK
    declaration order — the storage order of a WITHOUT ROWID table's
    key record (column-level ``x TYPE PRIMARY KEY`` or the table-level
    ``PRIMARY KEY (a, b)`` form)."""
    import re as _re  # noqa: PLC0415

    for col in _split_columns(create_sql):
        words = col.strip().upper().split()
        if words[:2] == ["PRIMARY", "KEY"]:
            inner = col[col.find("(") + 1 : col.rfind(")")]
            pk_names = [_re.split(r"\s+", p.strip())[0].strip('"').lower()
                        for p in inner.split(",")]
            missing = [p for p in pk_names if p not in names]
            if missing:
                raise ValueError(
                    f"sqlite: PRIMARY KEY names {missing} not in "
                    "column list")
            return [names.index(p) for p in pk_names]
    out = []
    for i, col in enumerate(_split_columns(create_sql)):
        up = col.upper()
        if "PRIMARY KEY" in up and not _is_table_constraint(col):
            out.append(i)
    if len(out) != 1:
        raise ValueError(
            "sqlite: WITHOUT ROWID table needs exactly one PRIMARY "
            f"KEY declaration (found {len(out)})")
    return out


def _rowid_alias_index(create_sql: str) -> int | None:
    """Column index of an ``INTEGER PRIMARY KEY`` declaration (the
    rowid alias), if any — a light parse of the CREATE TABLE text, the
    same source of truth the C library uses."""
    for i, col in enumerate(_split_columns(create_sql)):
        words = col.strip().upper().split()
        if len(words) >= 4 and words[1] == "INTEGER" \
                and words[2] == "PRIMARY" and words[3] == "KEY":
            return i
    return None
