"""Ground-truth tests for the product-quantization ANN path (pq.py):
numpy-reimplementation parity for the trainer/encoder, code validity and
non-vacuity, a measured recall floor against the exact brute-force
ranking, and exactness of every emitted score (the shortlist is
exact-rerank'd, so PQ approximation may change WHICH pairs appear but
never a reported cosine)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.pq import (
    PQ_BLOCKS,
    PQ_CODES,
    PQ_LLOYD_ITERS,
    _encode_blocks,
    pq_encode,
    pq_topk,
    pq_train,
)
from national_caseload_data_ingest_spark.operators.similarity import (
    _normalized,
    brute_topk,
)
from national_caseload_data_ingest_spark.session import load_tables

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"

# Measured with the shipped shape (M=8, K=256, pad=246): recall@10 = 1.00
# at sf0.01 and 0.98 at sf0.1.  Floored well below so codebook drift from
# a data refresh can't flake the suite while a real screen regression
# (recall collapsing toward the random baseline) still fails loudly.
PQ_RECALL_FLOOR = 0.85


@pytest.fixture(scope="module")
def catalog():
    import __spark_entry__ as ent

    return ent.queries()


def _numpy_train(vecs_in_row_order, m_blocks, k_codes, seed_rows, iters):
    """Pure-numpy reimplementation of pq_train's math: same seeds, same
    Lloyd updates, additions in the same row order (np.add.at is an
    unbuffered sequential loop, matching the kernel's per-batch
    accumulation over a single partition)."""
    vn = _normalized(vecs_in_row_order)
    sm = _normalized(seed_rows)
    d = vn.shape[1]
    sub = d // m_blocks
    books = np.stack(
        [sm[:, b * sub : (b + 1) * sub] for b in range(m_blocks)]
    )
    for _ in range(iters):
        codes = _encode_blocks(vn, books)
        cnt = np.zeros((m_blocks, k_codes), dtype=np.int64)
        acc = np.zeros((m_blocks, k_codes, sub), dtype=np.float64)
        for b in range(m_blocks):
            blk = vn[:, b * sub : (b + 1) * sub]
            np.add.at(cnt[b], codes[:, b], 1)
            np.add.at(acc[b], codes[:, b], blk)
        nz = cnt > 0
        books[nz] = acc[nz] / cnt[nz][:, None]
    return books


def test_pq_train_encode_matches_numpy_recompute(spark):
    """Single-partition Spark training must equal the numpy recompute
    bitwise: same seeds, same iteration count, same addition order."""
    e = load_tables(spark, SF, "embeddings")["embeddings"].coalesce(1)
    books = pq_train(e)

    # rows in FILE order (no sort) — the order the kernel accumulates in
    pdf = e.select("vec_id", "embedding").toPandas()
    vecs = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
    seeds = (
        e.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"))
        .limit(PQ_CODES)
        .collect()
    )
    seed_rows = np.array(
        [list(r["embedding"]) for r in seeds], dtype=np.float64
    )
    want = _numpy_train(
        vecs, PQ_BLOCKS, len(seed_rows), seed_rows, PQ_LLOYD_ITERS
    )
    assert books.shape == want.shape
    assert np.array_equal(books, want), "codebooks diverge from numpy Lloyd"

    # encoder parity on the same codebooks
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(e, books).collect()
    }
    codes = _encode_blocks(_normalized(vecs), books)
    for vid, row in zip(pdf["vec_id"], codes):
        assert got[int(vid)] == list(row)


def test_pq_codes_valid_and_nonvacuous(spark):
    """Every code in range, every vector M codes, and every block actually
    uses multiple codebook entries (quantization isn't collapsed)."""
    e = load_tables(spark, SF, "embeddings")["embeddings"]
    books = pq_train(e)
    rows = pq_encode(e, books).collect()
    assert len(rows) == e.count()
    per_block = [set() for _ in range(PQ_BLOCKS)]
    for r in rows:
        assert len(r["codes"]) == PQ_BLOCKS
        for b, c in enumerate(r["codes"]):
            assert 0 <= c < PQ_CODES
            per_block[b].add(c)
    for b, used in enumerate(per_block):
        assert len(used) > 1, f"block {b} collapsed to one code"


def test_pq_recall_and_exact_scores_vs_bruteforce(spark, catalog):
    """recall@10 of the PQ path against the exact brute-force ranking
    clears the documented floor, every emitted cosine is bitwise-equal to
    the brute-force score for the same pair (precision of VALUES is 1.0
    by construction — shared exact rerank), and every query emits a full
    top-10."""
    exact_rows = catalog["cosine_topk_bruteforce"](spark, SF_MID).collect()
    exact_topk = {}
    for r in exact_rows:
        exact_topk.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    e = load_tables(spark, SF_MID, "embeddings")["embeddings"]
    all_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_topk(e, k=10**9).collect()
    }

    pq_rows = catalog["ann_pq_topk"](spark, SF_MID).collect()
    per_query = {}
    hits = total = 0
    for r in pq_rows:
        per_query.setdefault(r["query_id"], []).append(r)
        key = (r["query_id"], r["neighbor_id"])
        assert all_scores[key] == r["cos_sim"], key
    for qid, want in exact_topk.items():
        got = {r["neighbor_id"] for r in per_query.get(qid, [])}
        hits += len(got & want)
        total += len(want)
        assert len(per_query[qid]) == len(want)  # full top-k emitted
    recall = hits / total
    print(f"\npq recall@10 vs brute force at sf0.01: {recall:.3f}")
    assert recall >= PQ_RECALL_FLOOR, f"PQ recall {recall:.3f}"


def test_pq_topk_partition_invariance(spark):
    """The ADC screen + exact rerank must emit the same relation whether
    the corpus is one Arrow batch or many tiny ones (per-batch shortlists
    are supersets; the rerank canonicalizes)."""
    e = load_tables(spark, SF, "embeddings")["embeddings"].filter(
        F.col("vec_id") < 80
    )
    one = sorted(tuple(r) for r in pq_topk(e.coalesce(1), n_queries=3).collect())
    many = sorted(
        tuple(r) for r in pq_topk(e.repartition(16), n_queries=3).collect()
    )
    assert one and one == many
