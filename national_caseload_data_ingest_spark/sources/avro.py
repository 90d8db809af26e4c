"""Pure-stdlib Apache Avro Object Container File codec (write + read)
and its distributed Spark plumbing.

Spark ships no Avro reader without the external ``spark-avro`` package,
but Avro remains a standard interchange format for row-oriented feeds
(Kafka dumps, data-vendor drops), so the engine carries its own codec
built from the public Avro 1.11 spec — the same
implement-the-format-from-the-spec contract as the PNG/GIF/JPEG/WAV
codecs (multimodal.py):

* container layout: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  data blocks of (record count, byte size, records, sync);
* binary encoding: zigzag-varint longs, length-prefixed UTF-8 strings /
  bytes, little-endian IEEE doubles, 1-byte booleans, and 2-branch
  ``["null", T]`` unions (branch index + value);
* codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951 — stdlib).

Supported schemas are records of those primitives — enough for every
tabular feed shape in this repo; nested records/arrays raise a loud
``NotImplementedError`` (the honest-gating convention).

Distributed shape: encoding and decoding are narrow Arrow
``mapInPandas`` kernels — each PARTITION becomes one self-contained
container payload (its own header + sync), so write parallelism is the
table's partitioning and read parallelism is one task per file
(``binaryFile`` source).  Avro blocks are sync-delimited, so a
block-splitting reader is possible; one-file-one-task is the honest
implemented granularity and files should be written partition-sized —
the module says so rather than pretending to split.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

# (avro primitive, nullable) per supported Spark type
_SPARK_TO_AVRO = {
    "bigint": "long",
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
    # logical types (Avro 1.11 spec §Logical Types): annotated primitives
    "timestamp": "timestamp-micros",
    "date": "date-days",
}

# internal type token -> schema JSON for annotated primitives
_LOGICAL_SCHEMAS = {
    "timestamp-micros": {"type": "long", "logicalType": "timestamp-micros"},
    "date-days": {"type": "int", "logicalType": "date"},
}


# -- primitive encoders ---------------------------------------------------

def _write_long(out: bytearray, n: int) -> None:
    """Zigzag varint (spec: 64-bit)."""
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


def _write_str(out: bytearray, s: str) -> None:
    _write_bytes(out, s.encode("utf-8"))


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def long(self) -> int:
        shift = 0
        z = 0
        while True:
            b = self.d[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return bytes(out)

    def str_(self) -> str:
        return self.bytes_().decode("utf-8")

    def double(self) -> float:
        (v,) = struct.unpack_from("<d", self.d, self.pos)
        self.pos += 8
        return v

    def raw(self, n: int) -> bytes:
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return bytes(out)


def _avro_schema(fields: list[tuple[str, str]], name: str) -> dict:
    """Build the record schema JSON: every field a ``["null", T]`` union
    (matches Spark's everything-nullable columns)."""
    out = []
    for fname, spark_type in fields:
        if spark_type not in _SPARK_TO_AVRO:
            raise NotImplementedError(
                f"avro codec supports primitive columns only, got "
                f"{fname}: {spark_type}"
            )
        avro_t = _SPARK_TO_AVRO[spark_type]
        out.append(
            {"name": fname,
             "type": ["null", _LOGICAL_SCHEMAS.get(avro_t, avro_t)]}
        )
    return {"type": "record", "name": name, "fields": out}


def _encode_value(out: bytearray, typ: str, v) -> None:
    if v is None:
        _write_long(out, 0)  # union branch 0 = null
        return
    _write_long(out, 1)  # union branch 1 = value
    if typ in ("long", "int"):
        _write_long(out, int(v))
    elif typ == "timestamp-micros":
        # pandas Timestamps carry ns in .value; exact micros division
        _write_long(out, int(pd.Timestamp(v).value // 1000))
    elif typ == "date-days":
        _write_long(out, (pd.Timestamp(v) - pd.Timestamp(0)).days)
    elif typ == "double":
        out.extend(struct.pack("<d", float(v)))
    elif typ == "float":
        out.extend(struct.pack("<f", float(v)))
    elif typ == "string":
        _write_str(out, str(v))
    elif typ == "bytes":
        _write_bytes(out, bytes(v))
    elif typ == "boolean":
        out.append(1 if v else 0)
    else:  # pragma: no cover - guarded at schema build
        raise NotImplementedError(typ)


def _decode_value(r: _Reader, typ: str):
    branch = r.long()
    if branch == 0:
        return None
    if typ in ("long", "int"):
        return r.long()
    if typ == "timestamp-micros":
        return pd.Timestamp(r.long(), unit="us")
    if typ == "date-days":
        return (pd.Timestamp(0) + pd.Timedelta(days=r.long())).date()
    if typ == "double":
        return r.double()
    if typ == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if typ == "string":
        return r.str_()
    if typ == "bytes":
        return r.bytes_()
    if typ == "boolean":
        return r.raw(1) == b"\x01"
    raise NotImplementedError(typ)


def avro_encode(
    rows: list[tuple],
    fields: list[tuple[str, str]],
    codec: str = "deflate",
    block_records: int = 4096,
    name: str = "row",
) -> bytes:
    """Rows (tuples aligned with ``fields``) → one Avro container file."""
    import hashlib  # noqa: PLC0415

    schema = _avro_schema(fields, name)
    schema_json = json.dumps(schema)
    # deterministic sync marker (any 16 bytes are legal per spec)
    sync = hashlib.md5(schema_json.encode()).digest()

    out = bytearray()
    out.extend(MAGIC)
    # file metadata map: one block of 2 entries, then end-of-map
    _write_long(out, 2)
    _write_str(out, "avro.schema")
    _write_bytes(out, schema_json.encode())
    _write_str(out, "avro.codec")
    _write_bytes(out, codec.encode())
    _write_long(out, 0)
    out.extend(sync)

    types = [_SPARK_TO_AVRO[t] for _, t in fields]
    for start in range(0, len(rows), block_records):
        chunk = rows[start : start + block_records]
        body = bytearray()
        for row in chunk:
            for typ, v in zip(types, row):
                _encode_value(body, typ, v)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC-1951, spec
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


def avro_decode(payload: bytes) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Avro container file → (fields, rows)."""
    r = _Reader(payload)
    if r.raw(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            r.long()
        for _ in range(n):
            k = r.str_()
            meta[k] = r.bytes_()
    sync = r.raw(16)
    schema = json.loads(meta["avro.schema"])
    codec = (meta.get("avro.codec") or b"null").decode()
    if schema.get("type") != "record":
        raise NotImplementedError("top-level schema must be a record")
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = [x for x in t if x != "null"][0]
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "timestamp-micros" and t.get("type") == "long":
                t = "timestamp-micros"
            elif lt == "date" and t.get("type") == "int":
                t = "date-days"
            else:
                raise NotImplementedError("nested avro types")
        fields.append((f["name"], t))
    rows: list[tuple] = []
    while r.pos < len(r.d):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        br = _Reader(block)
        for _ in range(count):
            rows.append(tuple(_decode_value(br, t) for _, t in fields))
    return fields, rows


# -- distributed plumbing -------------------------------------------------

def encode_partitions(
    df: DataFrame, codec: str = "deflate"
) -> DataFrame:
    """Each partition → one row (payload binary): a self-contained Avro
    container per partition, built inside an Arrow kernel."""
    fields = [(n, t) for n, t in df.dtypes]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False, name=None):
                rows.append(
                    tuple(None if pd.isna(v) else v for v in row)
                )
        if rows:
            yield pd.DataFrame(
                {"payload": [avro_encode(rows, fields, codec=codec)]}
            )

    return df.mapInPandas(kernel, schema="payload binary")


def decode_payloads(payloads: DataFrame, out_schema: str) -> DataFrame:
    """(payload binary) rows → decoded records, one Arrow kernel per
    payload batch."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for payload in pdf["payload"]:
                fields, rows = avro_decode(bytes(payload))
                frames.append(
                    pd.DataFrame(rows, columns=[n for n, _ in fields])
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return payloads.mapInPandas(kernel, schema=out_schema)


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> None:
    """Write ``df`` as one Avro container file per partition under
    ``path`` (local/shared filesystem).  Files are partition-sized — the
    read path is one task per file, so size partitions accordingly."""
    import os  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    os.makedirs(path, exist_ok=True)
    fields = [(n, t) for n, t in df.dtypes]

    def write_part(it):
        rows = [tuple(row) for row in it]
        if rows:
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
            with open(fname, "wb") as f:
                f.write(avro_encode(rows, fields, codec=codec))

    df.foreachPartition(write_part)


def read_avro(spark: SparkSession, path: str, out_schema: str) -> DataFrame:
    """Read a directory of Avro container files distributedly: the
    ``binaryFile`` source gives one row per file, each decoded by the
    Arrow kernel on its executor."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
        .withColumnRenamed("content", "payload")
    )
    return decode_payloads(files, out_schema)
