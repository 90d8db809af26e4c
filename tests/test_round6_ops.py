"""Ground-truth tests for the round-6 late additions: the
MATCH_RECOGNIZE-lite pattern matcher, the leakage-safe group split, the
Arrow IPC round-trip, and the mergeable HLL distinct sketch."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.behavior import (
    PATTERN,
    event_pattern_matches,
)
from national_caseload_data_ingest_spark.operators.curation import (
    SPLIT_TRAIN_HEX,
    SPLIT_VAL_HEX,
    leakage_safe_split,
)
from national_caseload_data_ingest_spark.operators.formats import (
    decode_arrow_ipc_payloads,
    encode_arrow_ipc_partitions,
)
from national_caseload_data_ingest_spark.operators.sketch import (
    HLL_LGK,
    hll_merge_estimate,
    hll_month_sketches,
)

T0 = datetime.datetime(2024, 1, 1)


def _events(spark, seqs: dict[int, str]):
    """Build an events df from per-user token strings ('v'=view, ...)."""
    names = {"v": "view", "c": "click", "p": "purchase", "e": "error", "s": "signup"}
    rows = []
    eid = 0
    for uid, seq in seqs.items():
        for i, tok in enumerate(seq):
            rows.append((eid, T0 + datetime.timedelta(minutes=i), uid, names[tok], 1.0))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


# ---------------------------------------------------------------- pattern


def test_pattern_counts_non_overlapping_adjacent(spark):
    out = {
        r["user_id"]: r
        for r in event_pattern_matches(
            _events(
                spark,
                {
                    1: "vcpvcp",  # two clean adjacent matches
                    2: "vcecp",  # gap (error between c and p): no match
                    3: "vvcp",  # match starts at position 2
                    4: "vcpcp",  # only one: second 'cp' lacks leading v
                },
            )
        ).collect()
    }
    assert out[1]["n_matches"] == 2 and out[1]["first_match_pos"] == 1
    assert out[2]["n_matches"] == 0 and out[2]["first_match_pos"] == 0
    assert out[3]["n_matches"] == 1 and out[3]["first_match_pos"] == 2
    assert out[4]["n_matches"] == 1
    assert out[1]["n_events"] == 6


def test_pattern_adjacency_is_stricter_than_funnel(spark):
    """A user who completes the funnel WITH gaps matches the funnel but
    not the adjacent pattern — the semantic the operator adds."""
    from national_caseload_data_ingest_spark.operators.behavior import funnel

    e = _events(spark, {7: "vecep"})  # view..click..purchase, gapped
    f3 = funnel(e, ("view", "click", "purchase"))
    assert {r["step"]: r["users"] for r in f3.collect()}[3] == 1  # funnel: yes
    assert event_pattern_matches(e).collect()[0]["n_matches"] == 0  # adjacent: no


def test_pattern_ordering_is_event_time_not_arrival(spark):
    """Rows arriving shuffled still sequence by (ts, event_id)."""
    rows = [
        (2, T0 + datetime.timedelta(minutes=2), 1, "purchase", 1.0),
        (0, T0, 1, "view", 1.0),
        (1, T0 + datetime.timedelta(minutes=1), 1, "click", 1.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).repartition(3)
    assert event_pattern_matches(e).collect()[0]["n_matches"] == 1


# ------------------------------------------------------------------ split


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _clusters(spark, pairs: dict[int, int]):
    return spark.createDataFrame(
        list(pairs.items()), "doc_id long, cluster_id long"
    )


def test_split_keeps_clusters_whole_and_covers_all_docs(spark):
    docs = _docs(spark, {i: f"doc {i}" for i in range(200)})
    # three clusters: {0..9}, {20,21}, {30,31,32}; rest singletons
    mapping = {i: 0 for i in range(10)}
    mapping.update({20: 20, 21: 20, 30: 30, 31: 30, 32: 30})
    out = leakage_safe_split(docs, _clusters(spark, mapping)).collect()
    assert len(out) == 200 and {r["split"] for r in out} <= {"train", "validation", "test"}
    by_group: dict[int, set] = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # no group straddles folds
    # cluster members inherit the GROUP hash, singletons their own id
    g = {r["doc_id"]: r["group_id"] for r in out}
    assert g[5] == 0 and g[21] == 20 and g[32] == 30 and g[100] == 100


def test_split_is_leakage_safe_where_doc_hash_split_is_not(spark):
    """Construct a near-dup family whose members a doc-level md5 split
    would scatter across folds; the group split keeps them together."""
    import hashlib

    def doc_fold(doc_id: int) -> str:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return "train" if h < SPLIT_TRAIN_HEX else ("validation" if h < SPLIT_VAL_HEX else "test")

    # find doc ids whose own hashes disagree → a naive split would leak
    ids = list(range(1000))
    leaky = [i for i in ids if doc_fold(i) != doc_fold(ids[0])][:3] + [ids[0]]
    docs = _docs(spark, {i: f"dup text {min(leaky)}" for i in leaky})
    clusters = _clusters(spark, {i: min(leaky) for i in leaky})
    out = leakage_safe_split(docs, clusters).collect()
    assert len({r["split"] for r in out}) == 1  # group split: one fold
    assert len({doc_fold(r["doc_id"]) for r in out}) > 1  # naive split: leaks


def test_split_proportions_roughly_follow_thresholds(spark):
    docs = _docs(spark, {i: f"doc {i}" for i in range(2000)})
    empty = _clusters(spark, {})
    frac = {
        r["split"]: r["n"] / 2000
        for r in leakage_safe_split(docs, empty)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(frac["train"] - 0.75) < 0.05
    assert abs(frac.get("validation", 0) - 0.125) < 0.04
    assert abs(frac.get("test", 0) - 0.125) < 0.04


# -------------------------------------------------------------- arrow ipc


def test_arrow_ipc_payload_roundtrip_lossless(spark):
    docs = _docs(
        spark,
        {1: 'comma, "quote"\nnewline', 2: "", 3: "plain", 4: "x" * 4096},
    ).repartition(3)
    back = decode_arrow_ipc_payloads(
        encode_arrow_ipc_partitions(docs),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    a = {r["doc_id"]: r for r in docs.collect()}
    b = {r["doc_id"]: r for r in back.collect()}
    assert set(a) == set(b)
    assert all(a[k]["text"] == b[k]["text"] for k in a)


def test_arrow_ipc_allnull_and_nullable_int_batches(spark):
    """Round-6 advice: the Arrow schema comes from the SPARK schema, so a
    partition whose string column is ALL null must not infer null-type
    (concat mismatch), and a nullable bigint must come back as an exact
    int — not float64-drifted (values above 2^53 would round)."""
    big = (1 << 55) + 1  # not representable in float64
    df = spark.createDataFrame(
        [(1, None, big), (2, None, None), (3, None, big + 2)],
        "id bigint, tag string, amount bigint",
    ).repartition(2)
    back = decode_arrow_ipc_payloads(
        encode_arrow_ipc_partitions(df), "id bigint, tag string, amount bigint"
    )
    rows = {r["id"]: r for r in back.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(rows[k]["tag"] is None for k in rows)
    assert rows[1]["amount"] == big and rows[3]["amount"] == big + 2
    assert rows[2]["amount"] is None


def test_arrow_ipc_empty_partitions_yield_no_rows(spark):
    docs = _docs(spark, {1: "one"}).repartition(8)
    payloads = encode_arrow_ipc_partitions(docs)
    assert payloads.count() <= 8  # empty partitions emit nothing
    back = decode_arrow_ipc_payloads(
        payloads,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert back.count() == 1


def test_arrow_ipc_file_io_roundtrip(spark, tmp_path):
    """Real file IO: payloads written as .arrow files, read back via the
    binaryFile source — the cluster-mode hand-off path."""
    docs = _docs(spark, {i: f"text {i}" for i in range(50)}).repartition(4)
    out = tmp_path / "ipc"
    out.mkdir()
    for i, r in enumerate(encode_arrow_ipc_partitions(docs).collect()):
        (out / f"part-{i:05d}.arrow").write_bytes(bytes(r["payload"]))
    files = spark.read.format("binaryFile").load(f"file://{out}/*.arrow")
    back = decode_arrow_ipc_payloads(
        files.select(F.col("content").alias("payload")),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert back.count() == 50
    assert back.agg(F.sum("doc_id")).collect()[0][0] == sum(range(50))


# -------------------------------------------------------------------- hll


@pytest.fixture(scope="module")
def orders_like(spark):
    rows = [
        (i, i % 700, T0.date() + datetime.timedelta(days=i % 400)) for i in range(5000)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )


def test_hll_merge_tracks_direct_estimate(spark, orders_like):
    """Union of per-month sketches estimates what one whole-table sketch
    estimates — the mergeability contract.  NOT exact equality: the
    DataSketches union operator carries a different internal register
    representation (HLL_8 gadget) than a directly-built sketch, so the
    two estimates may differ by a hair; both stay inside the same error
    envelope around the truth."""
    merged = hll_merge_estimate(hll_month_sketches(orders_like)).collect()[0][0]
    direct = orders_like.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("o_custkey", F.lit(HLL_LGK))
        )
    ).collect()[0][0]
    assert abs(merged - direct) / direct < 0.01


def test_hll_estimate_within_error_bounds(spark, orders_like):
    merged = hll_merge_estimate(hll_month_sketches(orders_like)).collect()[0][0]
    true = 700
    assert abs(merged - true) / true < 0.05  # lgK=12 → ~1.6% rse, 3σ margin


def test_hll_sketch_state_is_bounded(spark, orders_like):
    sk = hll_month_sketches(orders_like).collect()
    assert all(len(bytes(r["sketch"])) <= (1 << HLL_LGK) + 64 for r in sk)


# -------------------------------------------------------------- histogram


def test_histogram_merge_is_union(spark):
    from national_caseload_data_ingest_spark.operators.sketch import (
        histogram_sketch,
    )

    a = spark.createDataFrame([(float(v),) for v in range(0, 100)], "v double")
    b = spark.createDataFrame([(float(v),) for v in range(50, 200)], "v double")
    both = a.unionAll(b)
    merged = (
        histogram_sketch(a, "v", 10)
        .unionAll(histogram_sketch(b, "v", 10))
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = histogram_sketch(both, "v", 10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_histogram_quantile_within_one_bucket_of_exact(spark):
    from national_caseload_data_ingest_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    vals = [float(v) for v in range(1, 10001)]  # uniform 1..10000
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    width = 100
    out = {
        r["q"]: r["upper_edge"]
        for r in histogram_quantiles(
            histogram_sketch(df, "v", width), width, (0.5, 0.9, 0.99)
        ).collect()
    }
    import math

    n = len(vals)
    for q, edge in out.items():
        exact = sorted(vals)[math.ceil(q * n) - 1]
        assert exact <= edge <= exact + width  # upper edge overshoots ≤ width


def test_histogram_state_is_bounded_by_range(spark):
    from national_caseload_data_ingest_spark.operators.sketch import (
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [(float(v % 500),) for v in range(20000)], "v double"
    )
    assert histogram_sketch(df, "v", 10).count() <= 50


# ---------------------------------------------------------------- skyline


def _pareto_of(rows):
    """Naive O(n²) dominance reference: (key, price, size) rows."""
    out = []
    for k, p, s in rows:
        dominated = any(
            (q_p <= p and q_s >= s and (q_p < p or q_s > s))
            for _, q_p, q_s in rows
        )
        if not dominated:
            out.append((k, p, s))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pareto_matches_naive_reference(spark, seed, monkeypatch, tmp_path):
    import random

    from national_caseload_data_ingest_spark.operators.analytic import (
        prefix_max_by_order,
    )

    rng = random.Random(seed)
    rows = [
        (i, round(rng.uniform(1, 50), 2), rng.randint(1, 30))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k long, price double, size int")
    pp = df.groupBy("price").agg(F.max("size").alias("pmax"))
    pref = prefix_max_by_order(pp, "price", "pmax")
    got = sorted(
        (r["k"], r["price"], r["size"])
        for r in df.join(pref, "price")
        .filter(
            ~(
                F.coalesce(F.col("prefix_max") >= F.col("size"), F.lit(False))
                | (F.col("pmax") > F.col("size"))
            )
        )
        .select("k", "price", "size")
        .collect()
    )
    assert got == _pareto_of(rows) and len(got) > 0


def test_pareto_keeps_exact_ties(spark):
    """Two rows identical on BOTH dimensions: neither dominates, both
    stay in the frontier."""
    from national_caseload_data_ingest_spark.operators.analytic import (
        prefix_max_by_order,
    )

    rows = [(1, 10.0, 5), (2, 10.0, 5), (3, 20.0, 4)]
    df = spark.createDataFrame(rows, "k long, price double, size int")
    pp = df.groupBy("price").agg(F.max("size").alias("pmax"))
    pref = prefix_max_by_order(pp, "price", "pmax")
    kept = sorted(
        r["k"]
        for r in df.join(pref, "price")
        .filter(
            ~(
                F.coalesce(F.col("prefix_max") >= F.col("size"), F.lit(False))
                | (F.col("pmax") > F.col("size"))
            )
        )
        .collect()
    )
    assert kept == [1, 2]


def test_prefix_max_matches_global_window(spark):
    from pyspark.sql import Window

    from national_caseload_data_ingest_spark.operators.analytic import (
        prefix_max_by_order,
    )

    rows = [(float(i), (i * 37) % 101) for i in range(1000)]
    df = spark.createDataFrame(rows, "o double, v int").repartition(17)
    got = {
        r["o"]: r["prefix_max"]
        for r in prefix_max_by_order(df, "o", "v").collect()
    }
    w = Window.orderBy("o").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["o"]: r["pm"]
        for r in df.withColumn("pm", F.max("v").over(w)).collect()
    }
    assert got == want


# ----------------------------------------------------------------- ppjoin


def test_ppjoin_candidates_contain_every_true_pair(spark):
    """The prefix-filtering completeness theorem, checked against the
    brute-force ground truth on a corpus with planted near-dups."""
    from itertools import combinations

    from national_caseload_data_ingest_spark.operators.dedup import (
        jaccard_verify_candidates,
        ppjoin_candidates,
        word_bigram_postings,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        1: base,
        2: base,  # exact dup of 1
        3: base.replace("zeta", "ZED"),  # near-dup of 1
        4: "one two three four five six seven eight nine ten",
        5: "one two three four five six SEVEN eight nine ten",
        6: "totally different words everywhere nothing shared here at all ok",
    }
    docs = _docs(spark, texts)
    postings = word_bigram_postings(docs)
    t = 0.3
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in ppjoin_candidates(postings, t).collect()
    }
    # brute-force truth
    grams = {}
    for i, txt in texts.items():
        toks = txt.lower().split()
        grams[i] = set(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ) or {txt.lower()}
    true_pairs = {
        (a, b)
        for a, b in combinations(sorted(texts), 2)
        if len(grams[a] & grams[b]) / len(grams[a] | grams[b]) >= t
    }
    assert true_pairs  # fixture exercises the theorem
    assert true_pairs <= cands  # completeness: no true pair pruned
    # end-to-end: verified output == ground truth exactly
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_verify_candidates(postings, 
            ppjoin_candidates(postings, t), t).collect()
    }
    assert got == true_pairs


def test_ppjoin_three_tiers_emit_identical_relation(spark):
    """The stats ladder in ppjoin_neardup_pairs switches between three
    exact plans; on one corpus all three must emit the SAME relation —
    matmul block, direct posting join, and prefix-filter + verify."""
    from national_caseload_data_ingest_spark.operators.dedup import (
        _direct_jaccard_pairs,
        jaccard_pairs_in_blocks,
        jaccard_verify_candidates,
        ppjoin_candidates,
        word_bigram_postings,
    )
    from pyspark.sql import functions as SF

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        1: base,
        2: base,
        3: base.replace("zeta", "ZED"),
        4: "one two three four five six seven eight nine ten",
        5: "one two three four five six SEVEN eight nine ten",
        6: "totally different words everywhere nothing shared here at all",
        7: base + " lambda mu nu xi",
    }
    docs = _docs(spark, texts)
    postings = word_bigram_postings(docs).persist()
    t = 0.6

    def rel(df):
        return {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in df.collect()
        }

    tier1 = rel(
        jaccard_pairs_in_blocks(
            postings.withColumn("__blk", SF.lit(0)), ["__blk"], t
        )
    )
    tier2 = rel(_direct_jaccard_pairs(postings, t))
    tier3 = rel(
        jaccard_verify_candidates(
            postings, ppjoin_candidates(postings, t), t
        )
    )
    assert tier1, "fixture must produce pairs"
    assert tier1 == tier2 == tier3


def test_ppjoin_prefix_filter_actually_prunes(spark):
    """On a corpus of mostly-disjoint docs the candidate count must be
    far below all-pairs — the point of the prefix filter."""
    from national_caseload_data_ingest_spark.operators.dedup import (
        ppjoin_candidates,
        word_bigram_postings,
    )

    n = 120
    texts = {
        i: " ".join(f"w{i}t{j}" for j in range(12)) + " shared tail"
        for i in range(n)
    }
    docs = _docs(spark, texts)
    cands = ppjoin_candidates(word_bigram_postings(docs), 0.3).count()
    assert cands < n * (n - 1) / 2 / 4  # at least 4x below all-pairs


# -------------------------------------------------------- join estimation


def test_join_size_estimate_exact_under_uniform_keys(spark):
    """FK join where every key appears k times on the left and once on
    the right: the n·n/max(d,d) estimator is EXACT per bucket."""
    from national_caseload_data_ingest_spark.operators.profiling import (
        join_size_stats,
    )

    left = spark.range(3000).select((F.col("id") % 300).alias("k"))
    right = spark.range(300).select(F.col("id").alias("k"))
    la, rb = join_size_stats(left, right, "k", "k", 16)
    est = {
        r["bucket"]: r["na"] * r["nb"] / max(r["da"], r["db"])
        for r in la.join(rb, "bucket").collect()
    }
    true = {
        r["bucket"]: r["n"]
        for r in left.join(right, "k")
        .groupBy(F.pmod("k", F.lit(16)).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert est == true and sum(true.values()) == 3000


def test_join_size_estimate_overestimates_under_skew(spark):
    """Skew inflates the estimate (never deflates): the conservative
    direction for join planning."""
    from national_caseload_data_ingest_spark.operators.profiling import (
        join_size_stats,
    )

    # left: one hot key (1000 rows) + 100 singleton keys, same bucket mix
    left = spark.range(1100).select(
        F.when(F.col("id") < 1000, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    right = spark.range(1100).select(F.col("id").alias("k"))
    la, rb = join_size_stats(left, right, "k", "k", 4)
    rows = la.join(rb, "bucket").collect()
    est_total = sum(r["na"] * r["nb"] / max(r["da"], r["db"]) for r in rows)
    true_total = left.join(right, "k").count()
    assert est_total >= true_total


# --------------------------------------------------------------- division


def test_relational_division_requires_full_coverage(spark, tmp_path):
    """Hand-built warehouse: only the customer covering ALL part brands
    survives; partial coverage (4 of 5 brands) does not — even when the
    partial customer buys MORE distinct parts than the full one."""
    from national_caseload_data_ingest_spark.operators.relational import (
        customers_buying_all_core_parts,
    )

    # 10 parts over 5 brands (part p has brand p % 5)
    parts = [(p, f"Brand#{p % 5}") for p in range(10)]
    orders, lineitem = [], []
    ok = 0
    # customer 1: parts 0-4 → all 5 brands → qualifies
    # customer 2: parts {0,1,2,3,5,6,7,8} → 8 parts but only brands 0-3
    for cust, bought in [(1, [0, 1, 2, 3, 4]), (2, [0, 1, 2, 3, 5, 6, 7, 8])]:
        for p in bought:
            orders.append((ok, cust))
            lineitem.append((ok, p))
            ok += 1
    sf = tmp_path / "wh"
    spark.createDataFrame(
        [(o, c, "O", 1.0, None, "1-URGENT") for o, c in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(o, p, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for o, p in lineitem],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(p, f"part_{p}", b, "STANDARD", 1, 10.0) for p, b in parts],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(f"{sf}/part.parquet")
    got = {
        r["c_custkey"]: r["core_parts_bought"]
        for r in customers_buying_all_core_parts(spark, str(sf)).collect()
    }
    assert got == {1: 5}


def test_relational_division_nonvacuous_at_catalog_scale(spark):
    """The driver-gate retune: the division answer must be NON-empty at the
    sf0.001 catalog scale so the cross-engine hash-match exercises the
    count-match path (round-6 advice: the old top-5-parts divisor matched
    on 0 rows)."""
    from national_caseload_data_ingest_spark.operators.relational import (
        customers_buying_all_core_parts,
    )

    rows = customers_buying_all_core_parts(spark, "/root/testdata/sf0.001").collect()
    assert rows, "division answer vacuously empty at sf0.001"
    assert all(r["core_parts_bought"] == 25 for r in rows)


# ------------------------------------------------------------------- gini


def test_gini_known_values(spark):
    """Uniform values → 0; single holder → (n−1)/n."""
    from national_caseload_data_ingest_spark.operators.analytic import (
        nation_balance_gini,
    )

    rows = [(i, 0, 100.0) for i in range(10)]  # nation 0: perfectly even
    rows += [(100 + i, 1, 0.0) for i in range(9)] + [(109, 1, 500.0)]  # nation 1
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_acctbal double"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "customer.parquet"))
        got = {
            r["c_nationkey"]: r["gini"]
            for r in nation_balance_gini(spark, d).collect()
        }
    assert abs(got[0] - 0.0) < 1e-12
    assert abs(got[1] - 0.9) < 1e-12  # (n-1)/n with n=10


# ------------------------------------------------------------------ ivm


def test_join_view_delta_terms_are_disjoint_and_complete(spark):
    """The three delta terms partition the NEW join rows: incremental
    (stored + delta) equals the full recompute with no duplicates."""
    from national_caseload_data_ingest_spark.operators.incremental import (
        join_view_delta,
    )

    a = spark.createDataFrame(
        [(i, i % 5) for i in range(40)], "aid long, k long"
    )
    b = spark.createDataFrame(
        [(j, j % 5) for j in range(15)], "bid long, j long"
    )
    a_delta = a.filter(F.col("aid") % 3 == 0)
    a_base = a.filter(F.col("aid") % 3 != 0)
    b_delta = b.filter(F.col("bid") % 4 == 0)
    b_base = b.filter(F.col("bid") % 4 != 0)
    on = F.col("k") == F.col("j")
    stored = a_base.join(b_base, on)
    inc = stored.unionByName(
        join_view_delta(a_base, a_delta, b_base, b_delta, on)
    )
    full = a.join(b, on)
    inc_rows = sorted((r["aid"], r["bid"]) for r in inc.collect())
    full_rows = sorted((r["aid"], r["bid"]) for r in full.collect())
    assert inc_rows == full_rows  # complete AND duplicate-free
    assert len(inc_rows) == len(set(inc_rows))
