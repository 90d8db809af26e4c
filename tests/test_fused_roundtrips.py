"""The r14 round-trip kernel fusion is exact and stays in the plans.

Fusing a codec round-trip's encode and decode kernels into ONE
``mapInPandas``/``mapInArrow`` stage (``operators/formats._fused``,
``sources/{avro,msgpack,cbor}.roundtrip_partitions``) removes the
payload relation's Python→JVM→Python hop — pure boundary cost when the
payload has no other consumer (optimization guide §4.1).  These tests
pin both halves of that claim:

* **exactness** — the fused relation equals the two-stage relation
  row-for-row (the kernels are the same functions, composed as
  iterator transformers, so any divergence means the composition
  changed semantics);
* **plan shape** — the fused queries hold exactly ONE Python-eval
  node, so a refactor cannot silently reintroduce the boundary hop.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as _entry

QUERIES = _entry.queries()

SF_DIR = "/root/testdata/sf0.001"

FUSED = [
    "avro_roundtrip_documents",
    "avro_roundtrip_events",
    "avro_nested_roundtrip",
    "avro_union_roundtrip",
    "msgpack_roundtrip_events",
    "cbor_roundtrip_events",
    "protobuf_roundtrip_events",
    "sqlite_roundtrip_documents",
    "parquet_native_roundtrip",
    "archive_codec_features",
    "tar_roundtrip_documents",
    "arrow_ipc_roundtrip_documents",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", FUSED)
def test_fused_plan_has_one_python_stage(spark, name):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    n_py = plan.count("MapInPandas") + plan.count("MapInArrow") \
        + plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    assert n_py == 1, (
        f"{name}: expected exactly 1 Python-eval node after fusion, "
        f"found {n_py}\n" + plan[:2000])


def test_avro_fused_equals_two_stage(spark):
    from national_caseload_data_ingest_spark.sources.avro import (
        decode_payloads,
        encode_partitions,
        roundtrip_partitions,
    )

    df = spark.range(0, 97).selectExpr(
        "id", "cast(id * 1.5 as double) as v",
        "concat('s', id) as s",
        "timestamp_micros(cast(id * 1000001 as bigint)) as ts",
    )
    schema = "id bigint, v double, s string, ts timestamp"
    two = decode_payloads(encode_partitions(df, codec="deflate"), schema)
    one = roundtrip_partitions(df, schema, codec="deflate")
    assert _rows(one) == _rows(two)


def test_msgpack_fused_equals_two_stage(spark):
    from national_caseload_data_ingest_spark.sources.msgpack import (
        decode_payloads,
        encode_partitions,
        roundtrip_partitions,
    )

    df = spark.range(0, 97).selectExpr(
        "id", "cast(id as double) / 3 as v", "concat('m', id) as s"
    )
    schema = "id bigint, v double, s string"
    two = decode_payloads(encode_partitions(df), schema)
    one = roundtrip_partitions(df, schema)
    assert _rows(one) == _rows(two)


def test_cbor_fused_equals_two_stage(spark):
    from national_caseload_data_ingest_spark.sources.cbor import (
        decode_payloads,
        encode_partitions,
        roundtrip_partitions,
    )

    df = spark.range(0, 97).selectExpr(
        "id", "cast(id as double) / 7 as v", "concat('c', id) as s"
    )
    schema = "id bigint, v double, s string"
    two = decode_payloads(encode_partitions(df), schema)
    one = roundtrip_partitions(df, schema)
    assert _rows(one) == _rows(two)
