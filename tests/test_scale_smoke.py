"""Scale smoke for the dedup/ANN guard rails: a ~10⁵-doc synthetic corpus
(generated in-plan, never checked in) gives the 100 TB design claims their
first empirical leg —

- MinHash band-bucket occupancy stays linear (candidate pairs ≪ n²) and
  planted exact duplicates are all caught;
- SimHash band-bucket occupancy matches the documented scale rule
  (expected n / 2^key_bits, dedup.py's combination banding), and the
  in-plan occupancy guard ACTUALLY TRIPS on an adversarial skewed corpus;
- the Jaccard block kernel refuses an over-sized block (fail-fast, no
  silent O(n²));
- IVF k-means assignment spreads a 10⁵-vector corpus across cells without
  pathological skew.

Everything is derived from xxhash64 of the row id, so the corpus is
deterministic across runs and workers without shipping data."""

import pytest

from pyspark.sql import functions as F

N_DOCS = 100_000
VOCAB = 5_000
DOC_TOKENS = 30

pytestmark = pytest.mark.slow


def _synthetic_docs(spark, n=N_DOCS):
    """n docs of DOC_TOKENS pseudo-random words over a VOCAB-word
    vocabulary.  Ids in [0, 1000) come in identical pairs (2k and 2k+1
    share text) — 500 planted exact duplicates for recall checks."""
    base = F.when(F.col("id") < 1000, F.col("id") - F.col("id") % 2).otherwise(
        F.col("id")
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(base * DOC_TOKENS + i), F.lit(VOCAB)),
            ),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), text.alias("text"), F.lit("en").alias("lang")
    )


@pytest.fixture(scope="module")
def big_docs(spark):
    d = _synthetic_docs(spark).persist()
    d.count()
    yield d
    d.unpersist()


def test_minhash_bucket_join_stays_linear_and_catches_planted_dups(spark, big_docs):
    from national_caseload_data_ingest_spark.operators.dedup import (
        minhash_band_candidates,
        word_bigram_postings,
    )

    postings = word_bigram_postings(big_docs)
    cands = minhash_band_candidates(big_docs, postings).persist()
    n_pairs = cands.count()
    # bounded by bucket occupancy, not corpus size: on a random corpus the
    # candidate set must stay a small multiple of n, nowhere near n²/2 = 5e9
    assert 500 <= n_pairs < 5 * N_DOCS, n_pairs
    # identical docs have identical signatures — every planted pair must
    # surface in some band bucket (recall floor at scale)
    planted = {(2 * k, 2 * k + 1) for k in range(500)}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in cands.filter(F.col("doc_a") < 1000).collect()
    }
    missed = planted - got
    cands.unpersist()
    assert not missed, f"minhash missed {len(missed)} planted exact dups"


def test_simhash_occupancy_matches_documented_scale_rule(spark, big_docs):
    """dedup.py documents expected occupancy n / 2^key_bits for the
    combination banding (chunks=4 → 16-bit keys).  Measure it on 10⁵
    near-random signatures: the mean must sit near the closed form and the
    max far under the 8192 guard."""
    from national_caseload_data_ingest_spark.operators.dedup import (
        SIMHASH_BITS,
        SIMHASH_CHUNKS,
        simhash_signatures,
    )

    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS  # 16
    sigs = simhash_signatures(big_docs)
    # chunks=4, Hamming≤3 → keep=1: the band keys ARE the four 16-bit
    # chunks (the documented single-chunk classic scheme)
    buckets = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("bkey"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("bb"),
    ).select("bb.band", "bb.bkey")
    occ = (
        buckets.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.mean("n").alias("mean_occ"),
            F.max("n").alias("max_occ"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .first()
    )
    expected = N_DOCS / (1 << chunk_bits)  # ≈ 1.53
    # signatures of near-random docs aren't uniform iid, and the 500
    # planted dup pairs share buckets — allow generous but sub-quadratic
    # margins around the rule
    assert occ["mean_occ"] < 8 * max(expected, 1.0), occ
    assert occ["max_occ"] < 2_000, occ  # far under MAX_SIMHASH_BUCKET_DOCS
    assert occ["n_buckets"] > N_DOCS / 8, occ


def test_simhash_guard_trips_on_adversarial_skew(spark, big_docs):
    """10 001 byte-identical documents land in one band bucket — past the
    in-plan assert_true occupancy guard (default 8192), the job must FAIL
    with routing guidance, not run the quadratic bucket join."""
    from national_caseload_data_ingest_spark.operators.dedup import (
        simhash_pairs,
    )

    clones = spark.range(10_001).select(
        (F.col("id") + N_DOCS).alias("doc_id"),
        F.lit("the same adversarial document text repeated").alias("text"),
        F.lit("en").alias("lang"),
    )
    adversarial = big_docs.select("doc_id", "text", "lang").unionByName(clones)
    with pytest.raises(Exception, match="simhash band bucket holds"):
        simhash_pairs(adversarial).count()


def test_jaccard_block_kernel_refuses_oversized_block(spark, big_docs):
    """The exact verifier's lang blocking on a single-lang 10⁵ corpus
    exceeds MAX_BLOCK_DOCS — it must raise with routing guidance instead
    of running the 10⁵×10⁵ matmul."""
    from national_caseload_data_ingest_spark.operators.dedup import (
        jaccard_pairs_in_blocks,
        word_bigram_postings,
    )

    postings = word_bigram_postings(big_docs)
    with pytest.raises(Exception, match="LSH|max_block_docs|block"):
        jaccard_pairs_in_blocks(postings, ["lang"], 0.9).count()


def test_ivf_assignment_spreads_large_corpus(spark):
    """10⁵ pseudo-random 16-dim vectors through the real train+assign
    path: every cell non-pathological (no cell hoards the corpus), narrow
    assignment produces exactly one cell per vector."""
    from national_caseload_data_ingest_spark.operators.similarity import (
        ivf_assign,
        ivf_train,
    )

    k = 16
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(2000)).cast("float")
            / F.lit(1000.0)
            - F.lit(1.0)
        ),
    )
    e = spark.range(N_DOCS).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )
    cents = ivf_train(e, k=k, iters=2)
    assert len(cents) == k
    sizes = (
        ivf_assign(e, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in sizes)
    assert total == N_DOCS
    # documented rule: cells hold ~n/k; require no cell past 10× that and
    # at least half the cells in use (uniform corpus, loose bounds)
    assert max(r["n"] for r in sizes) < 10 * (N_DOCS / k), sizes
    assert len(sizes) >= k / 2, sizes


def test_lm_model_stays_distributed_at_scale(spark, big_docs):
    """Bigram-LM training on a 10⁵-doc corpus: the model relation must be
    vocabulary-bounded (≪ corpus tokens), scoring must stay a join (no
    broadcast of the bigram relation forced), and every held-out doc
    gets a finite perplexity."""
    from national_caseload_data_ingest_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    bigc, ctxc, vs = train_bigram_lm(big_docs)
    n_bigrams = bigc.count()
    # 5k-word vocab → ≤ 25M possible bigrams, but 3M observed tokens
    # cap the distinct relation far below corpus scale
    assert 0 < n_bigrams < 3_000_000
    # no forced broadcast of the model in the plan (AQE may add one at
    # runtime if it measures small — the point is we don't force it)
    scored = score_perplexity(big_docs, bigc, ctxc, vs)
    logical = scored._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("ppl").alias("max_ppl"),
        F.min("ppl").alias("min_ppl"),
    ).collect()[0]
    assert stats["n"] == N_DOCS // 5  # doc_id % 10 ∈ {8,9}
    assert 1.0 <= stats["min_ppl"] <= stats["max_ppl"] < float("inf")


def test_classifier_epoch_is_two_shuffles_at_scale(spark, big_docs):
    """One GD epoch over a 10⁵-doc sparse feature relation: driver state
    stays D+1 doubles, training converges on the length-signal task, and
    the checkpointed relation keeps the per-epoch groupBy exchange-free."""
    from national_caseload_data_ingest_spark.operators.classifier import (
        HASH_DIM,
        featurize,
        score_logreg,
        train_logreg,
    )

    # learnable surrogate: label by a token the doc actually contains
    labels = big_docs.select(
        "doc_id",
        F.col("text").contains("w0 ").cast("double").alias("y"),
    )
    feats = featurize(big_docs)
    w = train_logreg(feats, labels, epochs=4, lr=2.0)
    assert len(w) == HASH_DIM + 1
    scored = score_logreg(feats, w).join(labels, "doc_id")
    acc = scored.select(
        F.avg(((F.col("prob") >= 0.5) == (F.col("y") == 1.0)).cast("double"))
    ).collect()[0][0]
    # the w0-presence signal concentrates in one hash bucket — even 4
    # epochs must beat the base rate decisively
    base = labels.select(F.avg(F.greatest(F.col("y"), 1 - F.col("y")))).collect()[0][0]
    assert acc > 0.6, (acc, base)


def test_pagerank_rounds_are_bounded_at_scale(spark):
    """PageRank on a 10⁵-edge preferential-attachment-ish graph: ranks
    stay normalized and the hot hub gets the top rank — the AQE-skew
    shape the docstring promises."""
    from national_caseload_data_ingest_spark.operators.graph import pagerank

    # star-heavy graph: node i attaches to i % 1000 (1000 hubs), plus a
    # chain for diameter
    edges = spark.range(1, 100_000).select(
        F.col("id").alias("doc_a"), (F.col("id") % 1000).alias("doc_b")
    ).filter(F.col("doc_a") != F.col("doc_b"))
    pr = pagerank(edges, n_iter=5).persist()
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)
    top = pr.orderBy(F.col("pr").desc()).limit(1).collect()[0]
    pr.unpersist()
    assert top["doc_id"] < 1000  # a hub, not a leaf


def test_snb_linkage_is_linear_under_total_skew(spark):
    """10⁵ records with the SAME sort key — the input that makes blocked
    linkage quadratic (10¹⁰ candidate pairs) — produce exactly
    n·(w−1) − 6 SNB candidates and finish in one pass: the skew-immunity
    claim of link_records_snb, measured."""
    from national_caseload_data_ingest_spark.operators.linkage import (
        SNB_WINDOW,
        link_records_snb,
    )

    n = N_DOCS
    df = spark.range(n).select(
        F.col("id"), F.lit("identical-name").alias("nm")
    )
    out = link_records_snb(df, key_col="id", name_col="nm", window=SNB_WINDOW)
    expect = sum(n - g for g in range(1, SNB_WINDOW))
    assert out.count() == expect
