"""Driver result-contract tests.

The correctness harness canonicalizes each query result with a pandas
``sort_values`` over every output column before hashing.  A top-level
ARRAY/MAP/STRUCT column survives Arrow transfer as ``numpy.ndarray`` /
``dict`` cells, which pandas cannot factorize — round-3 CORRECTNESS
recorded exactly that ``TypeError: unhashable type: 'numpy.ndarray'`` for
``array_agg_order_keys``.  Contract: every registered query's FINAL
schema is flat (atomic types only); queries that compute arrays serialize
them with ``to_json`` in the last projection.

Schema-only: builds each query's plan, never executes it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_all_query_outputs_are_flat(spark, tmp_path):
    import __spark_entry__ as ent
    from pyspark.sql.types import ArrayType, MapType, StructType

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    offenders = {}
    for name, fn in ent.queries().items():
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, (
        f"queries with complex top-level output columns (driver canonicalizer "
        f"cannot hash them — serialize with to_json): {offenders}"
    )
