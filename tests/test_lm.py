"""Ground-truth tests for the bigram-LM perplexity operator
(`operators/lm.py`) against a tiny hand-checkable corpus scored by an
independent pure-Python reference implementation."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.lm import (
    LM_K,
    LM_TRAIN_MOD,
    score_perplexity,
    train_bigram_lm,
)

# doc_id % 10 < 8 → train; 8, 9 → held out.
DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "the cat and the dog sat"),
    (4, "on the mat sat a cat"),
    (5, "the the the"),
    (6, "dog"),  # single token: no bigrams, still contributes vocab
    (7, "a log on a mat"),
    (8, "the cat sat on the log"),  # held out, mostly in-vocab
    (9, "zebra quark sat on the mat"),  # held out, OOV words
]


def _reference_scores():
    """Independent add-k bigram LM in pure Python."""
    train = [(i, t.lower().split()) for i, t in DOCS if i % 10 < LM_TRAIN_MOD]
    held = [(i, t.lower().split()) for i, t in DOCS if i % 10 >= LM_TRAIN_MOD]
    big = Counter()
    ctx = Counter()
    vocab = set()
    for _, toks in train:
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    v = len(vocab)
    out = {}
    for doc_id, toks in held:
        pairs = list(zip(toks, toks[1:]))
        logps = [
            math.log((big[p] + LM_K) / (ctx[p[0]] + LM_K * v)) for p in pairs
        ]
        oov = sum(1 for p in pairs if p not in big) / len(pairs)
        nll = -sum(logps) / len(pairs)
        out[doc_id] = (len(pairs), oov, nll, math.exp(nll))
    return out, v


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lm_perplexity_matches_reference(spark, docs_df):
    bigc, ctxc, vs = train_bigram_lm(docs_df)
    got = {
        r["doc_id"]: r
        for r in score_perplexity(docs_df, bigc, ctxc, vs).collect()
    }
    want, _ = _reference_scores()
    assert set(got) == set(want)
    for doc_id, (n, oov, nll, ppl) in want.items():
        r = got[doc_id]
        assert r["n_bigrams"] == n
        assert r["oov_frac"] == pytest.approx(oov, abs=1e-12)
        assert r["avg_nll"] == pytest.approx(nll, rel=1e-12)
        assert r["ppl"] == pytest.approx(ppl, rel=1e-12)


def test_lm_vocab_and_model_shapes(spark, docs_df):
    bigc, ctxc, vs = train_bigram_lm(docs_df)
    _, v = _reference_scores()
    assert vs.collect()[0]["v"] == v
    # c(w1·) must equal the sum of bigram counts for that context
    per_ctx = (
        bigc.groupBy("w1").agg(F.sum("c").alias("s")).join(ctxc, "w1")
    )
    assert per_ctx.filter(F.col("s") != F.col("c1")).count() == 0
    # single-token training doc 6 adds 'dog' to vocab but no bigrams
    # starting a 'dog' context beyond those from other docs
    assert v == len({w for i, t in DOCS if i % 10 < 8 for w in t.split()})


def test_lm_oov_context_scores_uniform(spark):
    """A held-out bigram whose context never occurs in training must get
    exactly P = k/(k·V) = 1/V."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma"), (8, "omega omega")],
        "doc_id long, text string",
    )
    bigc, ctxc, vs = train_bigram_lm(docs)
    row = score_perplexity(docs, bigc, ctxc, vs).collect()[0]
    v = 3  # alpha beta gamma
    assert row["oov_frac"] == 1.0
    assert row["ppl"] == pytest.approx(v, rel=1e-12)


def test_lm_no_udfs_in_plan(spark, docs_df):
    """The whole scoring pass must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes (codegen tokenization + joins only)."""
    bigc, ctxc, vs = train_bigram_lm(docs_df)
    plan = (
        score_perplexity(docs_df, bigc, ctxc, vs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
