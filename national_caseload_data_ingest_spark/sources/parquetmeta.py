"""Native parquet FOOTER reader — Thrift compact protocol, FileMetaData
walk, and per-column row-group statistics.  Pure stdlib, from the
public parquet-format specification (Thrift IDL + the compact-protocol
encoding in Apache Thrift's spec).

Why a query engine that already scans parquet needs this: table
MAINTENANCE reads metadata, not data.  Backfilling min/max statistics
into a transaction log (``operators/txlog.py``), auditing row-group
sizes, or planning compactions needs exactly the FOOTER — reading it
natively costs kilobytes per file where a Spark scan job costs the
file.  The footer layout is ``... metadata ... | u32 len LE | "PAR1"``;
the metadata is one Thrift-compact ``FileMetaData`` struct:

* compact protocol: field headers ``(id_delta << 4) | type`` with
  zigzag-varint long-form ids, zigzag varints for i16/i32/i64, 8-byte
  LE doubles, varint-length binaries, list headers
  ``(size << 4) | elem_type`` (size 15 = varint follows), nested
  structs, BOOL encoded IN the field-header type;
* ``FileMetaData``: version(1), schema(2), num_rows(3), row_groups(4);
  ``RowGroup``: columns(1), total_byte_size(2), num_rows(3);
  ``ColumnChunk``: meta_data(3); ``ColumnMetaData``: type(1),
  path_in_schema(3), codec(4), num_values(5),
  total_uncompressed_size(6), total_compressed_size(7),
  statistics(12); ``Statistics``: null_count(3), max_value(5),
  min_value(6) — plain-encoded per the column's physical type.

Cross-validation: every footer the tests read is written by pyarrow /
Spark (the reference writers), and every extracted number is compared
against ``pyarrow.parquet.ParquetFile.metadata`` — the independent
implementation.

The generic walker returns nested ``{field_id: value}`` dicts, so
unknown/new fields are skipped structurally (Thrift's
forward-compatibility contract, like protobuf's unknown-field rule).
"""

from __future__ import annotations

import struct

MAGIC = b"PAR1"

_T_STOP, _T_TRUE, _T_FALSE, _T_BYTE = 0, 1, 2, 3
_T_I16, _T_I32, _T_I64, _T_DOUBLE = 4, 5, 6, 7
_T_BINARY, _T_LIST, _T_SET, _T_MAP, _T_STRUCT = 8, 9, 10, 11, 12


class _Reader:
    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("parquet: truncated thrift metadata")
        b = self.d[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        n = 0
        shift = 0
        while True:
            b = self.byte()
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7
            if shift > 70:
                raise ValueError("parquet: varint too long")

    def zigzag(self) -> int:
        z = self.varint()
        return (z >> 1) ^ -(z & 1)

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.d):
            raise ValueError("parquet: truncated thrift metadata")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def value(self, ttype: int, element: bool = False):
        if ttype in (_T_TRUE, _T_FALSE):
            if not element:
                # field context: the bool IS the header type byte
                return ttype == _T_TRUE
            # container-element context: compact protocol writes one
            # byte per bool element (1 = true, 2 = false; tolerate the
            # 0-as-false variant some writers emit)
            b = self.byte()
            if b == _T_TRUE:
                return True
            if b in (_T_FALSE, 0):
                return False
            raise ValueError(f"parquet: bad bool element byte {b:#x}")
        if ttype == _T_BYTE:
            return self.byte()
        if ttype in (_T_I16, _T_I32, _T_I64):
            return self.zigzag()
        if ttype == _T_DOUBLE:
            return struct.unpack("<d", self.take(8))[0]
        if ttype == _T_BINARY:
            return self.take(self.varint())
        if ttype in (_T_LIST, _T_SET):
            head = self.byte()
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self.varint()
            return [self.value(etype, element=True) for _ in range(size)]
        if ttype == _T_MAP:
            size = self.varint()
            if size == 0:
                return {}
            kv = self.byte()
            ktype, vtype = kv >> 4, kv & 0x0F
            return {
                self.value(ktype, element=True):
                    self.value(vtype, element=True)
                for _ in range(size)
            }
        if ttype == _T_STRUCT:
            return self.struct()
        raise ValueError(f"parquet: unknown thrift type {ttype}")

    def struct(self) -> dict:
        out: dict = {}
        fid = 0
        while True:
            head = self.byte()
            if head == _T_STOP:
                return out
            delta = head >> 4
            ttype = head & 0x0F
            fid = fid + delta if delta else self.zigzag()
            out[fid] = self.value(ttype)


def read_footer(data: bytes) -> dict:
    """Raw parquet file bytes → the FileMetaData struct as nested
    {field_id: value} dicts."""
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("parquet: bad magic")
    meta_len = struct.unpack("<I", data[-8:-4])[0]
    meta = data[-8 - meta_len : -8]
    if len(meta) != meta_len:
        raise ValueError("parquet: truncated footer")
    return _Reader(meta).struct()


# parquet physical types (Type enum)
_PHYS = {0: "boolean", 1: "int32", 2: "int64", 3: "int96",
         4: "float", 5: "double", 6: "byte_array",
         7: "fixed_len_byte_array"}


def _decode_stat(raw: bytes, phys: int):
    """Plain-encoded statistics value per physical type."""
    if phys == 1:
        return struct.unpack("<i", raw)[0]
    if phys == 2:
        return struct.unpack("<q", raw)[0]
    if phys == 4:
        return struct.unpack("<f", raw)[0]
    if phys == 5:
        return struct.unpack("<d", raw)[0]
    if phys == 0:
        return raw == b"\x01"
    return raw  # byte arrays: raw bytes (utf-8 for strings)


def footer_summary(data: bytes) -> dict:
    """The maintenance-relevant view: num_rows, row-group census, and
    per-column min/max/null_count folded ACROSS row groups."""
    fm = read_footer(data)
    num_rows = fm.get(3, 0)
    row_groups = fm.get(4, [])
    cols: dict[str, dict] = {}
    for rg in row_groups:
        for chunk in rg.get(1, []):
            md = chunk.get(3)
            if md is None:
                continue
            phys = md.get(1)
            path = ".".join(
                p.decode("utf-8") for p in md.get(3, [])
            )
            stats = md.get(12, {})
            entry = cols.setdefault(path, {
                "physical_type": _PHYS.get(phys, str(phys)),
                "min": None, "max": None, "null_count": 0,
                "num_values": 0, "compressed_bytes": 0,
            })
            entry["num_values"] += md.get(5, 0)
            entry["compressed_bytes"] += md.get(7, 0)
            entry["null_count"] += stats.get(3, 0)
            if 6 in stats:
                v = _decode_stat(stats[6], phys)
                if entry["min"] is None or v < entry["min"]:
                    entry["min"] = v
            if 5 in stats:
                v = _decode_stat(stats[5], phys)
                if entry["max"] is None or v > entry["max"]:
                    entry["max"] = v
    return {
        "num_rows": num_rows,
        "n_row_groups": len(row_groups),
        "columns": cols,
    }


def txlog_backfill_stats(
    table_path: str, cols: list[str]
) -> int:
    """Attach min/max stats for ``cols`` to every live add action that
    lacks them, read from the files' parquet FOOTERS — metadata-only
    maintenance (kilobytes per file, no Spark job): the operation that
    retrofits data skipping onto a table written without stats.
    Commits one new version re-adding the live files with stats;
    returns it."""
    import os  # noqa: PLC0415

    from national_caseload_data_ingest_spark.operators.txlog import (  # noqa: PLC0415
        txlog_commit,
        txlog_latest_version,
        txlog_live_files,
    )

    latest = txlog_latest_version(table_path)
    adds = txlog_live_files(table_path, latest)
    actions: list[dict] = [
        {"commitInfo": {"operation": "BACKFILL STATS"}}
    ]
    changed = 0
    for a in adds:
        missing = [c for c in cols if c not in a.get("stats", {})]
        if not missing:
            continue
        # the add's path is a directory of part files (txlog layout)
        full = os.path.join(table_path, a["path"])
        parts = sorted(
            os.path.join(full, f)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
        stats = dict(a.get("stats", {}))
        for part in parts:
            with open(part, "rb") as f:
                summary = footer_summary(f.read())
            for c in missing:
                colstat = summary["columns"].get(c)
                if colstat is None or colstat["min"] is None:
                    continue
                cur = stats.get(c)
                if cur is None:
                    stats[c] = {"min": int(colstat["min"]),
                                "max": int(colstat["max"])}
                else:
                    cur["min"] = min(cur["min"], int(colstat["min"]))
                    cur["max"] = max(cur["max"], int(colstat["max"]))
        if stats:
            changed += 1
            new_add = dict(a)
            new_add["stats"] = stats
            actions.append({"remove": {"path": a["path"]}})
            actions.append({"add": new_add})
    if changed == 0:
        return latest
    txlog_commit(table_path, latest + 1, actions)
    return latest + 1
