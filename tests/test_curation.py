"""Curation-operator semantics: connected-components transitivity (the
property pairwise dedup lacks), iteration-budget fail-fast, and shard
budget invariants.  Oracle hash-matches live in the driver gate /
tools/check_oracle.py; these tests pin the graph semantics directly.
"""

import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.curation import (
    TOKENS_PER_SHARD,
    connected_components,
    neardup_clusters,
    token_budget_shards,
)

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


def test_connected_components_multihop_chain(spark):
    """A chain 1-2-3-4 (diameter 3 — needs several propagation rounds)
    collapses to one component labeled by its min id; a disjoint pair
    keeps its own label; nodes absent from edges don't appear."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_iteration_budget(spark):
    """max_iter below the graph diameter must raise with routing guidance,
    never return partially-propagated labels."""
    chain = _edges(spark, [(i, i + 1) for i in range(1, 8)])
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(chain, max_iter=1)
    # and a budget at the diameter succeeds
    got = connected_components(chain, max_iter=8).collect()
    assert {r["cluster_id"] for r in got} == {1}


def test_neardup_clusters_consistent_with_pairs(spark):
    """Every cluster is labeled by its own minimum member (canonical
    representative), and members agree with the pairwise relation's
    transitive closure: each doc's cluster contains at least one doc it
    was directly paired with."""
    rows = neardup_clusters(spark, SF).collect()
    assert rows, "corpus produced no near-dup clusters"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert len(members) >= 2  # singletons are excluded by construction


def test_connected_components_matches_union_find(spark):
    """Cross-implementation check on seeded random graphs: the iterative
    Spark label propagation must agree with a reference union-find on
    every component assignment (min-id labeling)."""
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        nodes = list(range(1, 40))
        edges = [
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(30)
        ]
        # reference: union-find with min-id representatives
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        want = {x: find(x) for x in parent}
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(_edges(spark, edges)).collect()
        }
        assert got == want, f"seed {seed}: {got} != {want}"


def test_cluster_lsh_mode_matches_exact_mode(spark):
    """LSH candidate generation feeds connected components the same pair
    set as the exact blocked verify at thresholds where r=1 banding has
    ~complete recall (0.2 → per-pair miss ≤ 8e-4), so cluster assignments
    are identical."""
    from national_caseload_data_ingest_spark.operators.curation import (
        neardup_cluster_assignments,
    )

    exact = sorted(
        tuple(r)
        for r in neardup_cluster_assignments(
            spark, SF, neardup="exact", threshold=0.2
        ).collect()
    )
    lsh = sorted(
        tuple(r)
        for r in neardup_cluster_assignments(
            spark, SF, neardup="lsh", threshold=0.2
        ).collect()
    )
    assert exact == lsh
    assert exact, "no clusters at threshold 0.2 on the test corpus"


def test_corpus_build_lsh_mode_matches_exact_mode(spark):
    """The flagship seven-stage build with the LSH near-dup engine must
    reproduce the exact-mode (oracle) output bit-for-bit."""
    from national_caseload_data_ingest_spark.operators.curation import (
        corpus_build,
    )

    exact = sorted(
        tuple(r) for r in corpus_build(spark, SF, neardup="exact").collect()
    )
    lsh = sorted(
        tuple(r) for r in corpus_build(spark, SF, neardup="lsh").collect()
    )
    assert exact == lsh
    assert exact, "corpus build produced no rows on the test corpus"


def test_token_budget_shards_scaled_matches_window_form(spark):
    """The two-pass range-partitioned form (the 100 TB path: per-partition
    running sums + driver offset model, no global window) must reproduce
    the window form exactly — including languages split across range
    partitions (8 partitions over 5 langs forces splits)."""
    from national_caseload_data_ingest_spark.operators.curation import (
        token_budget_shards_scaled,
    )

    want = sorted(tuple(r) for r in token_budget_shards(spark, SF).collect())
    got = sorted(
        tuple(r)
        for r in token_budget_shards_scaled(spark, SF, n_partitions=8).collect()
    )
    assert got == want


def test_token_budget_shards_invariants(spark):
    """Shards number contiguously from 0 per lang, and every shard except
    the last holds ≥ the budget minus one doc's overshoot (greedy packing:
    a shard closes only once its running sum crosses the budget)."""
    rows = token_budget_shards(spark, SF).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {}).setdefault(r["shard"], []).append(
            r["n_tokens"]
        )
    for lang, shards in per_lang.items():
        ids = sorted(shards)
        assert ids == list(range(len(ids))), f"{lang}: non-contiguous {ids}"
        for s in ids[:-1]:
            assert sum(shards[s]) >= TOKENS_PER_SHARD - max(shards[s])


def test_balanced_mixture_sample_uniform_strata(spark):
    """Every language stratum in the output has exactly min-stratum-count
    docs; selection is a deterministic subset of the corpus (same rows on
    re-run, no RNG)."""
    from national_caseload_data_ingest_spark.operators.curation import (
        balanced_mixture_sample,
    )

    src = spark.read.parquet(f"{SF}/documents.parquet")
    per_lang = {
        r["lang"]: r["c"]
        for r in src.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    target = min(per_lang.values())

    out = balanced_mixture_sample(spark, SF)
    got = {
        r["lang"]: r["c"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == {lang: target for lang in per_lang}

    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    again = {
        r["doc_id"]
        for r in balanced_mixture_sample(spark, SF).select("doc_id").collect()
    }
    assert kept == again
    all_ids = {r["doc_id"] for r in src.select("doc_id").collect()}
    assert kept <= all_ids


def test_connected_components_deep_chain_logarithmic(spark):
    """A 200-hop chain must converge within the DEFAULT iteration budget:
    alternating large-star/small-star needs O(log n) rounds, where naive
    min-label propagation would need 200 — the regression that surfaced
    on the sf0.1 near-dup graph."""
    chain = _edges(spark, [(i, i + 1) for i in range(1, 201)])
    got = connected_components(chain).collect()
    assert {r["cluster_id"] for r in got} == {1}
    assert {r["doc_id"] for r in got} == set(range(1, 202))


def test_bloom_bitmap_no_false_negatives(spark):
    """Every inserted gram must pass the probe (Bloom filters never have
    false negatives), and a disjoint probe set must be mostly rejected
    (the screen actually screens)."""
    from national_caseload_data_ingest_spark.operators.curation import (
        bloom_bitmap,
        bloom_might_contain,
    )

    inserted = spark.createDataFrame(
        [(f"gram {i} here",) for i in range(500)], "gram string"
    )
    bm = bloom_bitmap(inserted)
    hits = inserted.filter(
        bloom_might_contain(F.col("gram"), bm)
    ).count()
    assert hits == 500
    absent = spark.createDataFrame(
        [(f"other {i} text",) for i in range(500)], "gram string"
    )
    false_pos = absent.filter(
        bloom_might_contain(F.col("gram"), bm)
    ).count()
    assert false_pos < 25, f"false-positive rate {false_pos / 500:.2%}"


def test_decontaminate_bloom_equals_exact(spark):
    """The bloom-screened plan must produce the IDENTICAL relation to the
    broadcast-exact plan — the screen only sheds non-matching postings."""
    from national_caseload_data_ingest_spark.operators.curation import (
        decontaminate_bloom,
        decontaminate_overlap,
    )

    key = lambda r: (r["doc_id"], r["shared_grams"], r["n_grams"])
    exact = sorted(map(key, decontaminate_overlap(spark, SF).collect()))
    bloom = sorted(map(key, decontaminate_bloom(spark, SF).collect()))
    assert exact == bloom
    assert exact, "corpus produced no contamination rows"
