"""Native parquet footer reader (sources/parquetmeta.py): every footer
read here was written by pyarrow or Spark, and every extracted number
is compared against pyarrow.parquet metadata — the independent
implementation."""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from national_caseload_data_ingest_spark.sources.parquetmeta import (
    footer_summary,
    read_footer,
    txlog_backfill_stats,
)


def _write(table: pa.Table, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def _pyarrow_stats(data: bytes) -> dict:
    md = pq.ParquetFile(io.BytesIO(data)).metadata
    out: dict = {"num_rows": md.num_rows, "rgs": md.num_row_groups,
                 "cols": {}}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if not st or not st.has_min_max:
                continue
            e = out["cols"].setdefault(
                col.path_in_schema, {"min": st.min, "max": st.max})
            e["min"] = min(e["min"], st.min)
            e["max"] = max(e["max"], st.max)
    return out


def test_footer_matches_pyarrow_metadata():
    t = pa.table({
        "k": pa.array(range(5000), pa.int64()),
        "i": pa.array([(x * 37) % 1000 - 500 for x in range(5000)],
                      pa.int32()),
        "v": pa.array([x * 0.25 for x in range(5000)], pa.float64()),
        "s": pa.array([f"w{x:05d}" for x in range(5000)], pa.string()),
        "b": pa.array([x % 2 == 0 for x in range(5000)], pa.bool_()),
    })
    for rg_size in (1000, 5000):
        data = _write(t, row_group_size=rg_size)
        got = footer_summary(data)
        want = _pyarrow_stats(data)
        assert got["num_rows"] == want["num_rows"]
        assert got["n_row_groups"] == want["rgs"]
        for name in ("k", "i", "v"):
            assert got["columns"][name]["min"] == want["cols"][name]["min"]
            assert got["columns"][name]["max"] == want["cols"][name]["max"]
        assert got["columns"]["s"]["min"].decode() \
            == want["cols"]["s"]["min"]
        assert got["columns"]["s"]["max"].decode() \
            == want["cols"]["s"]["max"]


def test_footer_on_spark_written_file(spark, tmp_path):
    """Spark's parquet writer is a THIRD implementation — its footers
    must parse identically."""
    p = str(tmp_path / "sp")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(777)], "k long, s string"
    ).coalesce(1).write.parquet(p)
    part = next(f for f in os.listdir(p) if f.endswith(".parquet"))
    with open(os.path.join(p, part), "rb") as f:
        data = f.read()
    got = footer_summary(data)
    assert got["num_rows"] == 777
    assert got["columns"]["k"]["min"] == 0
    assert got["columns"]["k"]["max"] == 776
    assert got["columns"]["k"]["null_count"] == 0


def test_guards():
    with pytest.raises(ValueError, match="magic"):
        read_footer(b"nope" + bytes(16))
    t = pa.table({"k": pa.array([1], pa.int64())})
    data = _write(t)
    with pytest.raises(ValueError, match="truncated|magic"):
        read_footer(data[: len(data) // 2] + data[-8:])


def test_bool_list_elements_consume_one_byte_each(tmp_path):
    """Compact protocol encodes bool CONTAINER elements as one byte
    each (1=true, 2=false), unlike bool FIELDS (encoded in the header
    type).  A walker that reuses the field fast-path would not consume
    the element bytes and desynchronize (ADVICE r11).  Hand-built
    struct: field 1 = list<bool>[T,F,T], field 2 = i32(7)."""
    from national_caseload_data_ingest_spark.sources.parquetmeta import (
        _Reader,
    )
    raw = bytes([
        0x19,              # field 1, type LIST
        0x31,              # list header: size 3, elem type TRUE(bool)
        0x01, 0x02, 0x01,  # true, false, true
        0x15,              # field 2, type I32
        0x0E,              # zigzag(7)
        0x00,              # STOP
    ])
    assert _Reader(raw).struct() == {1: [True, False, True], 2: 7}
    # a bool FIELD still comes from the header type, no extra byte
    raw2 = bytes([0x11, 0x12, 0x00])  # field1=true, field2=false, STOP
    assert _Reader(raw2).struct() == {1: True, 2: False}
    # garbage element byte raises cleanly
    with pytest.raises(ValueError, match="bool element"):
        _Reader(bytes([0x19, 0x11, 0x07, 0x00])).struct()


def test_backfill_enables_skipping(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_commit,
        txlog_live_files,
        txlog_scan,
    )

    base = str(tmp_path / "bf")
    actions = []
    for i in range(3):
        part = spark.createDataFrame(
            [(v,) for v in range(i * 100, (i + 1) * 100)], "v long")
        sub = os.path.join(base, f"r{i}")
        part.coalesce(1).write.parquet(sub)
        actions.append({"add": {"path": f"r{i}", "numRecords": 100}})
    txlog_commit(base, 0, actions)
    # no stats -> a range scan reads everything
    _df, read, total = txlog_scan(spark, base,
                                  min_max_filter=("v", 150, 160))
    assert (read, total) == (3, 3)
    v = txlog_backfill_stats(base, ["v"])
    assert v == 1
    live = txlog_live_files(base)
    assert all(a["stats"]["v"]["min"] == i * 100
               and a["stats"]["v"]["max"] == (i + 1) * 100 - 1
               for i, a in enumerate(live))
    df, read, total = txlog_scan(spark, base,
                                 min_max_filter=("v", 150, 160))
    assert (read, total) == (1, 3)
    assert sorted(r.v for r in df.collect()) == list(range(150, 161))
    # idempotent: nothing missing -> no new version
    assert txlog_backfill_stats(base, ["v"]) == 1
