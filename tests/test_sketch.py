"""Tests for the Count-Min Sketch (`operators/sketch.py`): numpy
reference parity on the same hash columns, the ≥-true invariant, the
ε-bound, and exact binary mergeability."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_merge,
    cms_token_counts,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


def _token_df(spark, counts: dict[str, int]):
    rows = [(w,) for w, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "tok string")


def test_sketch_matches_numpy_reference(spark):
    counts = {"alpha": 50, "beta": 20, "gamma": 7, "delta": 1}
    toks = _token_df(spark, counts)
    sk = {(r["row"], r["bucket"]): r["c"] for r in cms_build(toks).collect()}
    # rebuild from the SAME hash columns
    from national_caseload_data_ingest_spark.operators.sketch import _bucket

    hashed = toks.select(
        "tok", *[_bucket(F.col("tok"), r, CMS_WIDTH).alias(f"b{r}") for r in range(CMS_DEPTH)]
    ).collect()
    ref = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for row in hashed:
        for r in range(CMS_DEPTH):
            ref[r, row[f"b{r}"]] += 1
    for (r, b), c in sk.items():
        assert ref[r, b] == c
    assert ref.sum() == sum(sk.values()) == sum(counts.values()) * CMS_DEPTH


def test_estimates_upper_bound_and_exactness_when_sparse(spark):
    counts = {w: (i + 1) * 10 for i, w in enumerate(WORDS)}
    toks = _token_df(spark, counts)
    sketch = cms_build(toks)
    est = {
        r["tok"]: r["est"]
        for r in cms_estimate(sketch, WORDS + ["missing"]).collect()
    }
    n_total = sum(counts.values())
    eps = np.e / CMS_WIDTH
    for w, true in counts.items():
        assert est[w] >= true  # CMS never undercounts
        assert est[w] <= true + eps * n_total + 1
    # 5 distinct words in a 1024-wide sketch: collisions are essentially
    # impossible → exact
    assert all(est[w] == counts[w] for w in WORDS)
    assert est["missing"] == 0


def test_merge_equals_union_sketch(spark):
    a = _token_df(spark, {"alpha": 5, "beta": 3})
    b = _token_df(spark, {"beta": 4, "gamma": 9})
    merged = {
        (r["row"], r["bucket"]): r["c"]
        for r in cms_merge(cms_build(a), cms_build(b)).collect()
    }
    union = {
        (r["row"], r["bucket"]): r["c"]
        for r in cms_build(a.unionAll(b)).collect()
    }
    assert merged == union


def test_sketch_relation_is_bounded(spark):
    toks = _token_df(spark, {f"w{i}": 3 for i in range(2000)})
    assert cms_build(toks).count() <= CMS_DEPTH * CMS_WIDTH


def test_cms_query_invariant_on_real_corpus(spark):
    rows = cms_token_counts(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 7
    for r in rows:
        assert r["overestimate"] >= 0  # est ≥ exact, always
        assert r["est"] == r["exact"] + r["overestimate"]
    by_tok = {r["tok"]: r for r in rows}
    assert by_tok["zz_absent_token_1"]["exact"] == 0
