"""The scan-width fan-out fix (r14) stays in the plans.

A per-byte Python kernel that inherits the scan's partitioning
collapses to a handful of tasks when the input is one small parquet
file (measured 40x wall-clock at sf1: the 50k-row documents file
scanned as 7 splits on 32 cores).  Every heavy kernel entry point now
round-robins its skinny input to defaultParallelism first; these tests
pin the exchange into the physical plan so a refactor cannot silently
re-serialize the kernels.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as _entry

QUERIES = _entry.queries()

SF_DIR = "/root/testdata/sf0.001"

# representative query per patched entry point
FANNED = [
    "avro_nested_roundtrip",       # sources/avro.encode_partitions
    "msgpack_roundtrip_events",    # sources/msgpack.encode_partitions
    "cbor_roundtrip_events",       # sources/cbor.encode_partitions
    "parquet_native_roundtrip",    # formats.py enc
    "sqlite_roundtrip_documents",  # formats.py enc
    "mime_message_features",       # formats.py kernel
    "git_pack_features",           # formats.py kernel
    "zip_member_features",         # formats.py kernel
    "bpe_frozen_encode",           # bpe.bpe encode kernel
    "wordpiece_frozen_encode",     # wordpiece encode kernel
    "unigram_frozen_encode",       # unigram frozen kernel
    "nfc_normalize_docs",          # cleaning decorated kernel
    "embedding_pca_projection",    # embedding projection kernel
    "json_schema_infer",           # profiling path census kernel
]


@pytest.mark.parametrize("name", FANNED)
def test_kernel_input_is_round_robin_fanned(spark, name):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ROUND_ROBIN" in plan or "RoundRobinPartitioning" in plan, (
        f"{name}: no round-robin exchange before its Python kernel\n"
        + plan[:2000])
