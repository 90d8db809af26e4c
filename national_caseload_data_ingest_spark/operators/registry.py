"""Registry wiring query callables to their DuckDB oracle SQL.

``queries()``/``oracle_sql()`` in ``__spark_entry__.py`` are thin views over
these dicts.  A query registered with ``oracle=None`` is deliberately
oracle-less (approximate or hash-seeded semantics that no other engine can
reproduce bit-for-bit); the driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The per-round driver verifies queries in dict-iteration order and caps at
# the first 50 (the cap is empirical, see COVERAGE.md).  The window ROTATES
# per round so the union of CORRECTNESS_r0{1..N}.json converges on the full
# catalog: rounds 1-4 accumulated driver rows for 66 of the 103 queries
# with a category-complete static window; round 5 front-loads the 37
# queries that never earned a driver row (all replay green locally via
# tools/check_oracle.py), then back-fills the remaining 13 slots with
# already-checked representatives covering every SURVEY §2.2 category and
# LLM-pipeline family, so a single round's sheet stays category-complete
# too.  Queries past the cap are replayed locally with
# tools/check_oracle.py (same check, same data).
CHECK_PRIORITY: list[str] = [
    # -- never driver-checked through round 4: oracle-backed ---------------
    "tfidf_top_terms",  # round-4 new op
    "bm25_rank_docs",  # round-4 new op
    "pii_scrub",  # round-4 new op
    "unpivot_flag_metrics",  # round-4 new op (wide-to-long)
    "event_gap_stats",  # round-4 new op (lag/lead)
    "q2_min_cost_supplier",  # correlated scalar subquery
    "q4_order_priority_check",  # EXISTS semi
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_parts",  # HAVING over scalar subquery
    "q12_late_shipment_priority",
    "q13_customer_distribution",  # outer join + distribution
    "q14_promo_revenue",
    "q15_top_supplier",  # view/scalar-subquery max
    "q16_supplier_part_counts",  # NOT IN
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_excess_shippers",  # nested IN subqueries
    "q21_waiting_supplier",  # multi-EXISTS
    "q22_idle_customers",  # anti + scalar subquery
    "explode_part_words",  # lateral explode
    "upsert_latest_orders",  # CDC merge/upsert
    "common_ngram_fraction",  # postings overlap
    "stratified_sample_docs",  # deterministic stratified sampling
    "balanced_mixture_sample",  # balanced mixture sampling
    "token_budget_shards_scaled",  # 2-pass range-partitioned sharding
    "bpe_token_count",  # BPE-ish tokenizer
    "token_frequency_topk",  # vocab stats
    "token_length_histogram",
    "rare_token_fraction",
    "lexical_diversity_by_source",
    "repetition_score",
    # -- never driver-checked: rows-only by design -------------------------
    "cdc_chunk_stats",
    "embedding_neardup_ivf",
    "approx_quantity_percentiles",
    "streaming_lsh_candidates",
    # -- round-5 new operators (oracle-backed) -----------------------------
    "png_decode_features",  # real PNG decode E2E
    "wav_decode_features",  # real WAV PCM decode E2E
    "sliding_window_chunks",  # RAG/pretraining context-window chunking
    "latest_event_per_user",  # foreachBatch upsert batch twin
    "duplicate_passage_report",  # passage-level exact dedup
    "winnowing_fingerprints",  # MOSS winnowing fingerprints
    # -- already-checked category representatives (window stays complete;
    #    families whose slot went to a round-5 query remain covered inside
    #    the window: top-k by token_frequency_topk, json/array by
    #    explode_part_words, windows by event_gap_stats +
    #    token_budget_shards_scaled, percentiles by
    #    approx_quantity_percentiles, equi joins by q7-q9/q12-q14, exact
    #    dedup by duplicate_passage_report + training_corpus_build) ------
    "q1_pricing_summary",  # aggregation + filter + sort
    "asof_join_last_purchase",  # as-of join
    "skew_salted_join_agg",  # skew-mitigated join
    "grouping_sets_priority",  # grouping sets/cube/rollup family
    "tumbling_window_events",  # streaming twin (batch form)
    "minhash_lsh_neardup",  # LSH family (rows-only, recall-tested)
    "training_corpus_build",  # 7-stage flagship pipeline
]


def check_ordered(d: dict) -> dict:
    """``d`` reordered so CHECK_PRIORITY entries lead (in that order) and
    everything else follows in registration order."""
    missing = [n for n in CHECK_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"CHECK_PRIORITY names not registered: {missing}")
    head = {n: d[n] for n in CHECK_PRIORITY if n in d}
    tail = {n: v for n, v in d.items() if n not in head}
    return {**head, **tail}
