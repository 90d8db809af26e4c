"""Native parquet data-page reader (sources/parquetdata.py): every
file read here is written by pyarrow or the driver (the reference
writers), and every value list is compared against pyarrow's own read
— the same independent-implementation contract as the footer reader."""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from national_caseload_data_ingest_spark.sources.parquetdata import (
    read_column,
    read_table_native,
)


def _table(n=5000) -> pa.Table:
    return pa.table({
        "k": pa.array(range(n), pa.int64()),
        "i": pa.array([(x * 37) % 1000 - 500 if x % 7 else None
                       for x in range(n)], pa.int32()),
        "v": pa.array([x * 0.25 if x % 5 else None
                       for x in range(n)], pa.float64()),
        "f": pa.array([x * 0.5 for x in range(n)], pa.float32()),
        "s": pa.array([f"wörd{x % 50}" if x % 3 else None
                       for x in range(n)], pa.string()),
        "b": pa.array([x % 2 == 0 for x in range(n)], pa.bool_()),
        "raw": pa.array([bytes([x % 251]) * (x % 9)
                         for x in range(n)], pa.binary()),
    })


def _close(a, b):
    if (a is None) != (b is None):
        return False
    return a is None or abs(a - b) < 1e-6


@pytest.mark.parametrize("comp", ["none", "snappy", "gzip", "zstd",
                                  "lz4"])
@pytest.mark.parametrize("use_dict", [True, False])
@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_matches_pyarrow_across_writer_configs(comp, use_dict, dpv):
    """codec × dictionary × page-version grid, multi-row-group files;
    snappy/zstd/lz4 pages decompress through the repo's own codecs."""
    t = _table()
    buf = io.BytesIO()
    pq.write_table(t, buf, compression=comp, use_dictionary=use_dict,
                   data_page_version=dpv, row_group_size=1200)
    got = read_table_native(buf.getvalue())
    for c in t.column_names:
        want = t.column(c).to_pylist()
        if c in ("v", "f"):
            assert all(_close(a, b) for a, b in zip(got[c], want)), c
        else:
            assert got[c] == want, c


def test_reads_driver_written_testdata():
    """The engine's own test tables read natively, matching pyarrow."""
    path = "/root/testdata/sf0.001/documents.parquet"
    if os.path.isdir(path):
        path = os.path.join(path, sorted(
            f for f in os.listdir(path) if f.endswith(".parquet"))[0])
    with open(path, "rb") as f:
        data = f.read()
    got = read_table_native(data)
    want = pq.read_table(path)
    for c in want.column_names:
        assert got[c] == want.column(c).to_pylist(), c


def test_reads_spark_written_file(spark, tmp_path):
    """Spark's parquet writer (the other reference implementation)."""
    from national_caseload_data_ingest_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents")[
        "documents"].select("doc_id", "text", "lang", "n_chars")
    out = str(tmp_path / "docs_pq")
    docs.coalesce(1).write.mode("overwrite").parquet(out)
    part = next(f for f in os.listdir(out) if f.endswith(".parquet"))
    with open(os.path.join(out, part), "rb") as f:
        data = f.read()
    got = read_table_native(data)
    want = {tuple(r) for r in docs.collect()}
    back = set(zip(got["doc_id"], got["text"], got["lang"],
                   got["n_chars"]))
    assert back == want and len(back) == 500


def test_int96_spark_timestamps(spark, tmp_path):
    """Spark writes timestamps as legacy INT96 by default; the raw
    12-byte values convert to epoch-micros matching Spark's own
    read."""
    from pyspark.sql import functions as F

    from national_caseload_data_ingest_spark.sources.parquetdata import (
        int96_to_micros,
    )

    df = spark.range(200).select(
        "id",
        F.timestamp_micros(
            (F.col("id") * 987654321 + 1577836800000000).cast("long")
        ).alias("ts"),
    )
    out = str(tmp_path / "ts_pq")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    part = next(f for f in os.listdir(out) if f.endswith(".parquet"))
    with open(os.path.join(out, part), "rb") as f:
        data = f.read()
    raw = read_column(data, "ts")
    assert all(isinstance(v, bytes) and len(v) == 12 for v in raw)
    got = sorted(int96_to_micros(v) for v in raw)
    want = sorted(
        r["m"] for r in df.select(
            F.unix_micros("ts").alias("m")).collect())
    assert got == want


def test_all_null_and_empty_columns():
    t = pa.table({
        "all_null": pa.array([None] * 100, pa.int64()),
        "empty_str": pa.array([""] * 100, pa.string()),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf)
    got = read_table_native(buf.getvalue())
    assert got["all_null"] == [None] * 100
    assert got["empty_str"] == [""] * 100


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd", "gzip"])
def test_native_writer_read_by_pyarrow(codec):
    """The native parquet WRITER (thrift-compact footer + PLAIN v1
    pages + bit-packed definition levels, pages compressed by the
    repo's OWN snappy/zstd encoders): pyarrow — the reference reader —
    must load the bytes identically, and so must the repo reader."""
    import random

    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    rng = random.Random(5)
    n = 2000
    cols = {
        "k": list(range(n)),
        "i": [rng.randrange(-2**31, 2**31) if x % 6 else None
              for x in range(n)],
        "v": [rng.random() * 1e6 if x % 4 else None for x in range(n)],
        "s": [f"wörd {x % 37}" if x % 3 else None for x in range(n)],
        "b": [x % 2 == 0 for x in range(n)],
        "raw": [bytes([x % 7]) * (x % 11) for x in range(n)],
    }
    types = {"k": "int64", "i": "int32", "v": "double", "s": "string",
             "b": "boolean", "raw": "binary"}
    data = write_parquet(cols, types, codec=codec)
    got = read_table_native(data)
    for c in cols:
        assert got[c] == cols[c], c
    t = pq.read_table(io.BytesIO(data))
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], c
    if codec != "none":
        assert len(data) < len(write_parquet(cols, types, "none"))
    # the written statistics feed both pyarrow AND the repo's own
    # footer_summary (the data-skipping pipeline)
    from national_caseload_data_ingest_spark.sources.parquetmeta import (
        footer_summary,
    )
    md = pq.ParquetFile(io.BytesIO(data)).metadata
    st = md.row_group(0).column(0).statistics  # column "k"
    assert st is not None and st.min == 0 and st.max == n - 1
    summ = footer_summary(data)["columns"]
    assert summ["k"]["min"] == 0 and summ["k"]["max"] == n - 1
    present_i = [v for v in cols["i"] if v is not None]
    assert summ["i"]["min"] == min(present_i)
    assert summ["i"]["max"] == max(present_i)
    assert summ["i"]["null_count"] == sum(
        1 for v in cols["i"] if v is None)


def test_nested_any_depth_matches_pyarrow():
    """Arbitrary-depth Dremel assembly (r13): list-of-struct,
    struct-of-list, list-of-list, map-of-list, struct-of-struct,
    list-of-map, and a depth-3 mix all reconstruct to generator ground
    truth (pyarrow wrote the files; the repo reader must agree)."""
    n = 150
    shapes = [
        ("list<struct>",
         pa.list_(pa.struct([("a", pa.int64()), ("s", pa.string())])),
         lambda i: None if i % 11 == 0 else ([] if i % 7 == 0 else [
             None if j % 4 == 0 else
             {"a": None if j % 3 == 0 else i * 10 + j,
              "s": None if j % 5 == 0 else f"x{j}"}
             for j in range(i % 4 + 1)])),
        ("struct<list>",
         pa.struct([("xs", pa.list_(pa.int64())), ("n", pa.int64())]),
         lambda i: None if i % 9 == 0 else
         {"xs": None if i % 5 == 0 else
          ([] if i % 4 == 0 else [i, None, i * 2]), "n": i}),
        ("list<list>", pa.list_(pa.list_(pa.int64())),
         lambda i: None if i % 11 == 0 else ([] if i % 7 == 0 else [
             None if j % 5 == 0 else
             ([] if j % 4 == 0 else
              [None if k % 3 == 0 else i + j + k
               for k in range(j % 3 + 1)])
             for j in range(i % 4 + 1)])),
        ("map<str,list>", pa.map_(pa.string(), pa.list_(pa.int64())),
         lambda i: None if i % 10 == 0 else ({} if i % 6 == 0 else {
             f"k{j}": None if j % 3 == 0 else [i, None][:max(j % 3, 1)]
             for j in range(i % 4 + 1)})),
        ("struct<struct>",
         pa.struct([("inner", pa.struct([("a", pa.int64()),
                                         ("b", pa.string())])),
                    ("z", pa.int64())]),
         lambda i: None if i % 9 == 0 else
         {"inner": None if i % 5 == 0 else
          {"a": None if i % 3 == 0 else i, "b": f"s{i}"}, "z": i * 2}),
        ("list<map>", pa.list_(pa.map_(pa.string(), pa.int64())),
         lambda i: None if i % 11 == 0 else [
             None if j % 4 == 0 else
             ({} if j % 3 == 0 else {f"m{j}": i + j})
             for j in range(i % 3 + 1)]),
        ("list<struct<list,map>>",
         pa.list_(pa.struct([("xs", pa.list_(pa.int64())),
                             ("m", pa.map_(pa.string(), pa.string()))])),
         lambda i: None if i % 13 == 0 else [
             None if j % 5 == 0 else
             {"xs": None if j % 4 == 0 else [i, None, j],
              "m": None if j % 3 == 0 else {f"k{j}": f"v{i}"}}
             for j in range(i % 4 + 1)]),
    ]
    for name, typ, gen in shapes:
        vals = [gen(i) for i in range(n)]
        t = pa.table({"c": pa.array(vals, typ)})
        buf = io.BytesIO()
        pq.write_table(t, buf, row_group_size=64)
        assert read_table_native(buf.getvalue())["c"] == vals, name


def test_gates_are_loud():
    """Reader gates fail loudly, never decode wrong — and the former
    bare-repeated gate is now a supported legacy layout (r14): the
    spec walk compiles it to an implicit required list."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        _node_spec,
    )
    bare = {"name": "r", "optional": False, "repeated": True,
            "phys": 2, "type_length": 0, "utf8": False,
            "converted": None, "logical": {}, "children": None}
    spec = _node_spec(bare, 0, [], [])
    assert spec["kind"] == "list" and spec["t_empty"] == 0
    assert spec["elem"]["kind"] == "scalar"
    assert spec["elem"]["leaf"]["max_def"] == 1
    assert spec["elem"]["leaf"]["max_rep"] == 1
    # unknown column
    t2 = pa.table({"k": pa.array([1], pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t2, buf)
    with pytest.raises(ValueError, match="no column"):
        read_column(buf.getvalue(), "nope")


@pytest.mark.parametrize("comp", ["none", "snappy", "zstd", "gzip"])
@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
@pytest.mark.parametrize("use_dict", [True, False])
def test_nested_list_struct_match_pyarrow(comp, dpv, use_dict):
    """One level of LIST and STRUCT (VERDICT r12 ask #3): repetition
    levels + multi-bit definition levels reconstructed to parity with
    pyarrow across codec × page-version × dictionary, with null lists,
    empty lists, null elements, null structs, and null struct fields
    all present, across multiple row groups."""
    import random

    rng = random.Random(7)
    n = 500
    lists, structs, words = [], [], []
    for i in range(n):
        if i % 11 == 0:
            lists.append(None)
        elif i % 7 == 0:
            lists.append([])
        else:
            lists.append([rng.randrange(100) if j % 5 else None
                          for j in range(i % 6 + 1)])
        structs.append(None if i % 9 == 0 else
                       {"lang": None if i % 4 == 0 else f"l{i % 3}",
                        "nc": i * 3})
        words.append(None if i % 13 == 0 else
                     [f"w{j}" if j % 3 else None for j in range(i % 4)])
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "vals": pa.array(lists, pa.list_(pa.int64())),
        "meta": pa.array(structs, pa.struct([("lang", pa.string()),
                                             ("nc", pa.int64())])),
        "words": pa.array(words, pa.list_(pa.string())),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression=comp, data_page_version=dpv,
                   use_dictionary=use_dict, row_group_size=128)
    got = read_table_native(buf.getvalue())
    for c in t.column_names:
        assert got[c] == t.column(c).to_pylist(), c


@pytest.mark.parametrize("comp", ["none", "snappy", "zstd", "gzip"])
@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
@pytest.mark.parametrize("use_dict", [True, False])
def test_map_matches_pyarrow(comp, dpv, use_dict):
    """Standard MAP layout to pyarrow parity across codec ×
    page-version × dictionary: null maps, empty maps, null values,
    int and string key types, multiple row groups."""
    n = 240
    smaps, imaps = [], []
    for i in range(n):
        if i % 11 == 0:
            smaps.append(None)
        elif i % 7 == 0:
            smaps.append({})
        else:
            smaps.append({f"k{j}": None if j % 3 == 0 else i * 10 + j
                          for j in range(i % 4 + 1)})
        imaps.append(None if i % 13 == 0 else
                     {j: f"v{i}_{j}" for j in range(i % 3)})
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "props": pa.array(smaps, pa.map_(pa.string(), pa.int64())),
        "tags": pa.array(imaps, pa.map_(pa.int64(), pa.string())),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression=comp, data_page_version=dpv,
                   use_dictionary=use_dict, row_group_size=100)
    got = read_table_native(buf.getvalue())
    assert got["id"] == list(range(n))
    for c in ("props", "tags"):
        want = [None if r is None else dict(r)
                for r in t.column(c).to_pylist()]
        assert got[c] == want, c


def test_map_required_outer_and_null_only_values():
    """A non-nullable MAP column (no outer def level) and a map whose
    every value is null still reconstruct."""
    vals = [{"k": 1}, {}, {"a": None, "b": 2}]
    t = pa.table({"m": pa.array(vals, pa.map_(pa.string(), pa.int64()))})
    schema = pa.schema(
        [pa.field("m", pa.map_(pa.string(), pa.int64()), nullable=False)])
    buf = io.BytesIO()
    pq.write_table(t.cast(schema), buf)
    assert read_table_native(buf.getvalue())["m"] == vals
    only_null = [{"x": None}, None, {"y": None, "z": None}]
    t2 = pa.table(
        {"m": pa.array(only_null, pa.map_(pa.string(), pa.int64()))})
    buf = io.BytesIO()
    pq.write_table(t2, buf)
    assert read_table_native(buf.getvalue())["m"] == only_null


def test_byte_stream_split_matches_pyarrow():
    """BYTE_STREAM_SPLIT: byte j of every value lives in stream j;
    floats/doubles/int32, nullable, across codec and page version."""
    import random

    rng = random.Random(8)
    n = 3000
    t = pa.table({
        "v": pa.array([rng.random() * 1e6 if x % 5 else None
                       for x in range(n)], pa.float64()),
        "f": pa.array([rng.random() for _ in range(n)], pa.float32()),
        "i": pa.array([rng.randrange(-2**31, 2**31)
                       for _ in range(n)], pa.int32()),
    })
    enc = {c: "BYTE_STREAM_SPLIT" for c in t.column_names}
    for comp in ("none", "zstd"):
        for dpv in ("1.0", "2.0"):
            buf = io.BytesIO()
            pq.write_table(t, buf, use_dictionary=False,
                           version="2.6", compression=comp,
                           data_page_version=dpv, row_group_size=800,
                           column_encoding=enc)
            got = read_table_native(buf.getvalue())
            assert got["i"] == t.column("i").to_pylist()
            for c in ("v", "f"):
                assert all(
                    _close(a, b) for a, b in
                    zip(got[c], t.column(c).to_pylist())), (comp, dpv)


@pytest.mark.parametrize("s_enc", ["DELTA_LENGTH_BYTE_ARRAY",
                                   "DELTA_BYTE_ARRAY"])
@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_delta_encodings_match_pyarrow(s_enc, dpv):
    """DELTA_BINARY_PACKED (miniblock bit-packed zigzag deltas, with
    int32/int64 wraparound and data-less trailing miniblocks) and the
    two byte-array incremental encodings, over nullable columns and
    multi-row-group files."""
    import random

    rng = random.Random(3)
    n = 4000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "j": pa.array([rng.randrange(-2**40, 2**40)
                       for _ in range(n)], pa.int64()),
        "i": pa.array([rng.randrange(-2**31, 2**31) if x % 6 else None
                       for x in range(n)], pa.int32()),
        "s": pa.array([f"prefix_common_{x % 7}_{x}" if x % 4 else None
                       for x in range(n)], pa.string()),
        "r": pa.array([bytes([x % 9]) * (x % 20)
                       for x in range(n)], pa.binary()),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, use_dictionary=False, version="2.6",
                   compression="zstd", data_page_version=dpv,
                   row_group_size=900,
                   column_encoding={"k": "DELTA_BINARY_PACKED",
                                    "j": "DELTA_BINARY_PACKED",
                                    "i": "DELTA_BINARY_PACKED",
                                    "s": s_enc, "r": s_enc})
    got = read_table_native(buf.getvalue())
    for c in t.column_names:
        assert got[c] == t.column(c).to_pylist(), c


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd", "gzip"])
def test_native_writer_nested(codec):
    """Nested WRITE (r13): list / struct / map columns emit def+rep
    level streams that pyarrow — the reference reader — reconstructs
    identically, and the repo reader round-trips (null lists, empty
    lists, null elements, null structs, null fields, null maps, empty
    maps, null values all present)."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    n = 400
    cols = {
        "id": list(range(n)),
        "xs": [None if i % 11 == 0 else
               ([] if i % 7 == 0 else
                [None if j % 3 == 0 else i * 10 + j
                 for j in range(i % 5 + 1)])
               for i in range(n)],
        "ws": [None if i % 13 == 0 else
               [f"w{i}_{j}" for j in range(i % 3)] for i in range(n)],
        "meta": [None if i % 9 == 0 else
                 {"lang": None if i % 4 == 0 else f"l{i % 3}",
                  "nc": i * 3} for i in range(n)],
        "props": [None if i % 10 == 0 else
                  ({} if i % 6 == 0 else
                   {f"k{j}": None if j % 2 else i + j
                    for j in range(i % 4 + 1)}) for i in range(n)],
    }
    types = {"id": "int64", "xs": "list<int64>", "ws": "list<string>",
             "meta": "struct<lang:string,nc:int64>",
             "props": "map<string,int64>"}
    data = write_parquet(cols, types, codec=codec)
    t = pq.read_table(io.BytesIO(data))
    for c in cols:
        got = t.column(c).to_pylist()
        if c == "props":
            got = [None if r is None else dict(r) for r in got]
        assert got == cols[c], f"pyarrow {c}"
    own = read_table_native(data)
    for c in cols:
        assert own[c] == cols[c], f"native {c}"


def test_native_writer_type_dsl():
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        _parse_write_type,
        write_parquet,
    )
    assert _parse_write_type("list<int64>") == ("list",
                                                ("scalar", "int64"))
    assert _parse_write_type("map<string,int64>") == (
        "map", "string", ("scalar", "int64"))
    assert _parse_write_type("list<list<int64>>") == (
        "list", ("list", ("scalar", "int64")))
    assert _parse_write_type(
        "struct<a:list<int64>,b:map<string,string>>") == (
        "struct", [("a", ("list", ("scalar", "int64"))),
                   ("b", ("map", "string", ("scalar", "string")))])
    with pytest.raises(NotImplementedError, match="type 'uuid'"):
        write_parquet({"c": [1]}, {"c": "uuid"})
    with pytest.raises(NotImplementedError, match="keys must be scalar"):
        _parse_write_type("map<list<int64>,int64>")


def test_native_writer_any_depth_roundtrip():
    """Recursive shredding (r13): deep nested columns written by the
    native writer read back identically through BOTH pyarrow (the
    reference reader) and the repo reader, on every codec."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    n = 90
    cols = {
        "id": list(range(n)),
        "los": [None if i % 11 == 0 else ([] if i % 7 == 0 else [
            None if j % 4 == 0 else
            {"a": None if j % 3 == 0 else i * 10 + j, "s": f"x{j}"}
            for j in range(i % 4 + 1)]) for i in range(n)],
        "lol": [None if i % 11 == 0 else ([] if i % 7 == 0 else [
            None if j % 5 == 0 else
            ([] if j % 4 == 0 else
             [None if k % 3 == 0 else i + j + k
              for k in range(j % 3 + 1)])
            for j in range(i % 4 + 1)]) for i in range(n)],
        "deep": [None if i % 13 == 0 else [
            None if j % 5 == 0 else
            {"xs": None if j % 4 == 0 else [i, None, j],
             "m": None if j % 3 == 0 else {f"k{j}": f"v{i}"}}
            for j in range(i % 4 + 1)] for i in range(n)],
    }
    types = {
        "id": "int64",
        "los": "list<struct<a:int64,s:string>>",
        "lol": "list<list<int64>>",
        "deep": "list<struct<xs:list<int64>,m:map<string,string>>>",
    }
    want_arrow = pa.table({
        "id": pa.array(cols["id"], pa.int64()),
        "los": pa.array(cols["los"], pa.list_(
            pa.struct([("a", pa.int64()), ("s", pa.string())]))),
        "lol": pa.array(cols["lol"], pa.list_(pa.list_(pa.int64()))),
        "deep": pa.array(cols["deep"], pa.list_(pa.struct(
            [("xs", pa.list_(pa.int64())),
             ("m", pa.map_(pa.string(), pa.string()))]))),
    })
    for codec in ("none", "snappy", "zstd", "gzip"):
        data = write_parquet(cols, types, codec=codec)
        t = pq.read_table(io.BytesIO(data))
        for c in cols:
            assert t.column(c).to_pylist() == \
                want_arrow.column(c).to_pylist(), (codec, c)
        own = read_table_native(data)
        for c in cols:
            assert own[c] == cols[c], (codec, c)


def test_nested_fuzz_both_directions():
    """Seeded random nested schemas (depth <= 3) x random values with
    None/empty at every level: pyarrow-written files must read
    natively to ground truth, and natively-written files must read
    back through pyarrow to ground truth."""
    import random

    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )

    def rand_type(rng, depth):
        opts = ["int64", "string", "double"]
        if depth < 3:
            opts += ["list", "struct", "map"]
        pick = rng.choice(opts)
        if pick == "list":
            inner, ityp, igen = rand_type(rng, depth + 1)
            return (f"list<{inner}>", pa.list_(ityp),
                    lambda r: None if r.random() < 0.15 else
                    [igen(r) for _ in range(r.randrange(0, 4))])
        if pick == "struct":
            n = rng.randrange(1, 3)
            fields = [(f"f{i}", *rand_type(rng, depth + 1))
                      for i in range(n)]
            typ = pa.struct([(f[0], f[2]) for f in fields])
            dsl = "struct<" + ",".join(f"{f[0]}:{f[1]}"
                                       for f in fields) + ">"

            def gen(r, fields=fields):
                if r.random() < 0.15:
                    return None
                return {f[0]: f[3](r) for f in fields}
            return (dsl, typ, gen)
        if pick == "map":
            inner, ityp, igen = rand_type(rng, depth + 1)
            return (f"map<string,{inner}>",
                    pa.map_(pa.string(), ityp),
                    lambda r: None if r.random() < 0.15 else
                    {f"k{i}": igen(r)
                     for i in range(r.randrange(0, 4))})
        gens = {
            "int64": lambda r: None if r.random() < 0.2
            else r.randrange(-10**6, 10**6),
            "string": lambda r: None if r.random() < 0.2
            else f"s{r.randrange(1000)}",
            "double": lambda r: None if r.random() < 0.2
            else round(r.random() * 100, 3),
        }
        return (pick, {"int64": pa.int64(), "string": pa.string(),
                       "double": pa.float64()}[pick], gens[pick])

    def norm(v):  # pyarrow map entries come back as (k, v) tuple lists
        if isinstance(v, list):
            if v and isinstance(v[0], tuple) and len(v[0]) == 2 \
                    and isinstance(v[0][0], str):
                return {k: norm(x) for k, x in v}
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        return v

    for seed in range(12):
        rng = random.Random(seed)
        dsl, typ, gen = rand_type(rng, 1)
        vals = [gen(rng) for _ in range(80)]
        # direction 1: pyarrow writes, native reads
        t = pa.table({"c": pa.array(vals, typ)})
        buf = io.BytesIO()
        pq.write_table(t, buf, row_group_size=32)
        assert read_table_native(buf.getvalue())["c"] == vals, \
            (seed, dsl, "pa->native")
        # direction 2: native writes, pyarrow reads (skip schemas that
        # are empty-map-ambiguous under to_pylist normalization: they
        # are covered exactly in direction 1)
        data = write_parquet({"c": vals}, {"c": dsl}, codec="snappy")
        got = [norm(v) for v in
               pq.read_table(io.BytesIO(data)).column("c").to_pylist()]
        mism = [(a, b) for a, b in zip(got, vals)
                if a != b and not _empty_map_ambiguous(a, b)]
        assert not mism, (seed, dsl, "native->pa", mism[:2])


def _empty_map_ambiguous(a, b) -> bool:
    """pyarrow's to_pylist renders empty maps as [] — equal modulo
    that ambiguity, recursively."""
    if a == [] and b == {}:
        return True
    if isinstance(a, list) and isinstance(b, list) and len(a) == len(b):
        return all(x == y or _empty_map_ambiguous(x, y)
                   for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict) \
            and a.keys() == b.keys():
        return all(a[k] == b[k] or _empty_map_ambiguous(a[k], b[k])
                   for k in a)
    return False


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd", "gzip"])
@pytest.mark.parametrize("dpv", [1, 2])
def test_native_writer_row_groups_and_v2_pages(codec, dpv):
    """Multi-row-group output with v1 OR v2 data pages (v2: levels
    uncompressed before compressed values, byte lengths + null/row
    counts in the header): pyarrow and the repo reader both
    reconstruct, the row-group count is honored, and per-row-group
    statistics carry the bounds row-group skipping needs."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    n = 450
    cols = {
        "id": list(range(n)),
        "name": [f"n{i % 37}" if i % 3 else None for i in range(n)],
        "xs": [None if i % 11 == 0 else
               ([] if i % 7 == 0 else [i, None, i * 2])
               for i in range(n)],
    }
    types = {"id": "int64", "name": "string", "xs": "list<int64>"}
    data = write_parquet(cols, types, codec=codec,
                         data_page_version=dpv, row_group_size=100)
    t = pq.read_table(io.BytesIO(data))
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], c
    own = read_table_native(data)
    for c in cols:
        assert own[c] == cols[c], c
    pf = pq.ParquetFile(io.BytesIO(data))
    assert pf.num_row_groups == 5
    bounds = [pf.metadata.row_group(i).column(0).statistics
              for i in range(5)]
    assert [(s.min, s.max) for s in bounds] == \
        [(i * 100, min(n, (i + 1) * 100) - 1) for i in range(5)]


def test_read_column_on_mixed_flat_nested_file():
    """read_column serves FLAT columns even when the file also holds
    nested ones; asking for the nested column routes the caller to
    read_table_native."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        read_column,
    )
    t = pa.table({
        "id": pa.array(range(20), pa.int64()),
        "s": pa.array([f"v{i}" if i % 3 else None for i in range(20)],
                      pa.string()),
        "xs": pa.array([[1, 2]] * 20, pa.list_(pa.int64())),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf)
    assert read_column(buf.getvalue(), "id") == list(range(20))
    assert read_column(buf.getvalue(), "s")[:4] == [None, "v1", "v2",
                                                    None]
    with pytest.raises(ValueError, match="nested"):
        read_column(buf.getvalue(), "xs")


def test_native_writer_nan_safe_statistics():
    """Python min()/max() over a NaN-bearing list is order-dependent
    (NaN compares false both ways); the writer must drop NaN before
    computing min/max — and omit Statistics entirely for an all-NaN
    column — so data skipping never prunes on a poisoned bound."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    nan = float("nan")
    cols = {
        "lead_nan": [nan, 5.0, -2.0, nan, 9.0, None],
        "all_nan": [nan, nan, nan, nan, nan, nan],
    }
    types = {"lead_nan": "double", "all_nan": "double"}
    data = write_parquet(cols, types, codec="none")
    md = pq.ParquetFile(io.BytesIO(data)).metadata
    by_name = {md.row_group(0).column(i).path_in_schema:
               md.row_group(0).column(i).statistics
               for i in range(md.num_columns)}
    st = by_name["lead_nan"]
    assert st is not None and st.min == -2.0 and st.max == 9.0
    assert st.null_count == 1
    assert by_name["all_nan"] is None
    # values themselves round-trip untouched (NaN kept in the data)
    got = pq.read_table(io.BytesIO(data)).column("lead_nan").to_pylist()
    assert got[1:3] == [5.0, -2.0] and got[0] != got[0]


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd", "gzip"])
def test_native_writer_dictionary_pages(codec):
    """Low-cardinality columns must get a PLAIN dictionary page +
    bit-packed PLAIN_DICTIONARY index pages under the "auto" policy
    (high-cardinality stays PLAIN), pyarrow and the repo reader must
    both decode them, and the dictionary file must be smaller than the
    PLAIN twin on repetitive data."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    n = 4000
    cols = {
        "cat": [f"category_{x % 13}" if x % 9 else None for x in range(n)],
        "code": [x % 29 for x in range(n)],
        "uniq": [f"u{x:07d}" for x in range(n)],
    }
    types = {"cat": "string", "code": "int64", "uniq": "string"}
    data = write_parquet(cols, types, codec=codec)
    md = pq.ParquetFile(io.BytesIO(data)).metadata
    encs = {md.row_group(0).column(i).path_in_schema:
            md.row_group(0).column(i).encodings
            for i in range(md.num_columns)}
    assert "PLAIN_DICTIONARY" in encs["cat"]
    assert "PLAIN_DICTIONARY" in encs["code"]
    assert "PLAIN_DICTIONARY" not in encs["uniq"]  # auto: high-card
    t = pq.read_table(io.BytesIO(data))
    got = read_table_native(data)
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], c
        assert got[c] == cols[c], c
    if codec == "none":
        plain = write_parquet(cols, types, codec=codec,
                              use_dictionary=False)
        assert len(data) < len(plain)


def test_native_writer_string_statistics_prune():
    """BYTE_ARRAY statistics (VERDICT r12 ask #4): exact min/max for
    short strings, truncated-but-VALID bounds past 64 bytes (min is a
    prefix lower bound, max is incremented), the all-0xFF max omitted —
    and a string-predicate file prune over footer_summary reads exactly
    the one natively-written file whose range intersects."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet,
    )
    from national_caseload_data_ingest_spark.sources.parquetmeta import (
        footer_summary,
    )
    # exact short-string stats, visible to pyarrow too
    data = write_parquet({"s": ["pear", "apple", None, "melon"]},
                         {"s": "string"}, codec="none")
    st = pq.ParquetFile(io.BytesIO(data)).metadata.row_group(0) \
        .column(0).statistics
    assert st.min == "apple" and st.max == "pear" and st.null_count == 1
    # truncated bounds stay valid
    long_vals = ["y" * 100 + f"{x:03d}" for x in range(40)]
    data = write_parquet({"s": long_vals}, {"s": "string"}, codec="none")
    fs = footer_summary(data)["columns"]["s"]
    assert len(fs["min"]) <= 64 and len(fs["max"]) <= 64
    assert fs["min"] <= min(long_vals).encode()
    assert fs["max"] >= max(long_vals).encode()
    # all-0xFF max is omitted rather than wrong
    data = write_parquet({"b": [b"\xff" * 80, b"\x01"]}, {"b": "binary"},
                         codec="none")
    fs = footer_summary(data)["columns"]["b"]
    assert fs["min"] == b"\x01" and fs["max"] is None
    # the data-skipping scenario: three files, disjoint string ranges
    files = {
        "f0": ["apple", "banana", "cherry"],
        "f1": ["mango", "melon", "peach"],
        "f2": ["tomato", "yam", "zebra"],
    }
    payloads = {k: write_parquet({"fruit": v}, {"fruit": "string"})
                for k, v in files.items()}
    lo, hi = b"lemon", b"pear"
    read = []
    for k, payload in payloads.items():
        s = footer_summary(payload)["columns"]["fruit"]
        # conservative: missing bounds never skip
        if ((s["min"] is None or s["min"] <= hi)
                and (s["max"] is None or s["max"] >= lo)):
            read.append(k)
    assert read == ["f1"]
    survivors = [v for k in read
                 for v in read_table_native(payloads[k])["fruit"]
                 if lo.decode() <= v <= hi.decode()]
    assert survivors == ["mango", "melon", "peach"]


def test_assemble_leaf_rejects_excess_repetition_level():
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        _assemble_leaf,
    )

    # first slot claims r=1 with no list open yet: corrupt page
    with pytest.raises(ValueError, match="repetition level"):
        _assemble_leaf([1], [1], [7], t_reps=[1], max_def=1)
    # mid-stream slot claims r=2 with only one list open
    with pytest.raises(ValueError, match="repetition level"):
        _assemble_leaf([1, 1], [0, 2], [7, 8], t_reps=[1], max_def=1)


def test_merge_tokens_rejects_sibling_nullness_disagreement():
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        _merge_tokens,
    )

    # struct<a: int, b: int>, both optional inside an optional struct:
    # struct-null threshold t=1, leaf max_def=2.
    spec = {
        "kind": "struct",
        "t": 1,
        "ids": [0, 1],
        "fields": [
            ("a", {"kind": "scalar", "id": 0, "t": 2}),
            ("b", {"kind": "scalar", "id": 1, "t": 2}),
        ],
    }
    # consistent: both leaves say the struct is present
    out = _merge_tokens(spec, {0: (2, 5), 1: (1, None)})
    assert out == {"a": 5, "b": None}
    # consistent: both say the struct is null
    assert _merge_tokens(spec, {0: (0, None), 1: (0, None)}) is None
    # corrupt: leaf 0 says null struct, leaf 1 carries data
    with pytest.raises(ValueError, match="sibling leaves disagree"):
        _merge_tokens(spec, {0: (0, None), 1: (2, 9)})


# --- legacy pre-standard layouts (LogicalTypes.md backward-compat) ----------


def _legacy_file():
    """One file exercising every legacy layout the reader claims:
    bare repeated leaf, 2-level repeated primitive under LIST, 2-level
    repeated multi-field group ("array") under LIST, and the hoisted
    MAP_KEY_VALUE outer map — written by the repo's fixture writer
    (pyarrow cannot produce these layouts)."""
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet_legacy,
    )

    n = 400
    cols = {
        "doc_id": list(range(n)),
        "nums": [[] if i % 7 == 0 else [i * 3 + j for j in range(i % 5)]
                 for i in range(n)],
        "tags": [None if i % 11 == 0 else
                 [] if i % 6 == 0 else
                 [f"t{i % 13}-{j}" for j in range(i % 4 + 1)]
                 for i in range(n)],
        "pts": [None if i % 9 == 0 else
                [] if i % 8 == 0 else
                [{"x": i + j, "y": i * j} for j in range(i % 3 + 1)]
                for i in range(n)],
        "kv": [None if i % 10 == 0 else
               {} if i % 5 == 0 else
               {f"k{j}": None if (i + j) % 4 == 0 else i * 10 + j
                for j in range(i % 3 + 1)}
               for i in range(n)],
    }
    types = {
        "doc_id": "int64",
        "nums": "bare<int64>",
        "tags": "two_level<string>",
        "pts": "two_level_struct<x:int64,y:int64>",
        "kv": "legacy_map<string,int64>",
    }
    return write_parquet_legacy(cols, types), cols


def test_legacy_layouts_native_read():
    data, cols = _legacy_file()
    got = read_table_native(data)
    assert got["doc_id"] == cols["doc_id"]
    assert got["nums"] == cols["nums"]
    assert got["tags"] == cols["tags"]
    assert got["pts"] == cols["pts"]
    assert got["kv"] == cols["kv"]


def test_legacy_layouts_match_pyarrow():
    # pyarrow's reader implements the same backward-compat rules, so it
    # independently validates the hand-built legacy bytes AND pins the
    # native reader's interpretation of each layout.
    data, _cols = _legacy_file()
    t = pq.read_table(io.BytesIO(data))
    got = read_table_native(data)
    assert t.column("doc_id").to_pylist() == got["doc_id"]
    assert t.column("nums").to_pylist() == got["nums"]
    assert t.column("tags").to_pylist() == got["tags"]
    assert t.column("pts").to_pylist() == got["pts"]
    # pyarrow surfaces parquet maps as lists of (key, value) tuples
    pk = [None if m is None else dict(m)
          for m in t.column("kv").to_pylist()]
    assert pk == got["kv"]


def test_legacy_tuple_named_group_is_element():
    # `repeated group <name>_tuple { ... }` under LIST: the repeated
    # group is the ELEMENT (struct), not a 3-level middle group, even
    # though it has exactly one field.
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet_legacy,
    )

    rows = [[{"v": 1}, {"v": 2}], None, [], [{"v": 9}]]
    data = write_parquet_legacy(
        {"xs": rows}, {"xs": "two_level_struct<v:int64|xs_tuple>"})
    got = read_table_native(data)
    assert got["xs"] == rows
    assert pq.read_table(io.BytesIO(data)).column("xs").to_pylist() == rows


def test_legacy_bare_repeated_skipped_by_flat_reader():
    # schema_leaves serves only flat scalars; a bare repeated leaf is
    # an implicit list and must route to read_table_native, not raise.
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        read_footer,
        schema_leaves,
    )

    data, _cols = _legacy_file()
    leaves = schema_leaves(read_footer(data))
    assert set(leaves) == {"doc_id"}
    # the flat column still reads via the direct path
    assert read_column(data, "doc_id") == list(range(400))


def test_legacy_writer_rejects_unrepresentable_values():
    from national_caseload_data_ingest_spark.sources.parquetdata import (
        write_parquet_legacy,
    )

    with pytest.raises(ValueError, match="cannot be null"):
        write_parquet_legacy({"xs": [None]}, {"xs": "bare<int64>"})
    with pytest.raises(ValueError, match="required"):
        write_parquet_legacy({"xs": [[1, None]]}, {"xs": "bare<int64>"})
    with pytest.raises(ValueError, match="required"):
        write_parquet_legacy(
            {"xs": [[None]]}, {"xs": "two_level<int64>"})
