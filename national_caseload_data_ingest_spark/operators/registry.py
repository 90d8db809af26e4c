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
# per round so the union of CORRECTNESS_r0{1..N}.json stays fresh across
# the whole catalog.  Round-12 rotation (VERDICT r11 ask #7 — the
# freshest-row-age tail):
#
# 1. round-12 NEW or semantics-changed queries lead.  The seven
#    r11-window repeats are all changed-semantics re-checks (within the
#    ≤~10-key overlap allowance): the PDF container gained xref streams/
#    ObjStm/predictors + the six-way filter rotation, the ZIP walker
#    gained zip64 rotation, SQLite gained the WAL sidecar rotation,
#    protowire gained strict wire-type/length validation,
#    txlog_time_travel runs through the new checkpoint regression guard,
#    the tokenizer trainers switched to top-K routing
#    (wordpiece_train_encode / bpe_train_encode), and the archive zstd
#    class rotates native-machine and repo-writer frames;
# 2. ALL 14 queries whose freshest driver row is ROUND 4 (the oldest
#    tail — this clears r4 entirely, moving the oldest age to r5);
# 3. round-5-stale fill in name order up to the 50-cap.  The 49 r5-stale
#    names exceed the remaining slots, so the spill (from
#    "q2_min_cost_supplier" on) is listed after the cap for the r13
#    window and covered meanwhile by the local full-catalog replay at
#    sf0.01 and sf0.1 (tools/check_oracle.py; COVERAGE.md close-sweep).
CHECK_PRIORITY: list[str] = [
    # -- round-12: new or semantics changed this round ----------------------
    "wordpiece_frozen_encode",  # frozen-vocab encode, token-string oracle (new)
    "pdf_text_features",  # xref streams + ObjStm + predictors (changed)
    "zip_member_features",  # zip64 container rotation (changed)
    "sqlite_roundtrip_documents",  # WAL sidecar rotation (changed)
    "protobuf_roundtrip_events",  # strict wire-type/length decode (changed)
    "txlog_time_travel",  # checkpoint regression guard on path (changed)
    "wordpiece_train_encode",  # top-K vocab routing (changed)
    "bpe_train_encode",  # top-K vocab routing (changed; also r6-stale)
    "archive_codec_features",  # native-zstd + repo-writer rotation (changed)
    "parquet_native_roundtrip",  # native data-page reader (new)
    # -- freshest driver row is round 4 (all of them) ------------------------
    "scalar_subquery_above_avg",
    "semi_join_urgent_customers",
    "session_window_events",
    "set_union_all_party_nations",
    "signup_purchase_within_hour",
    "string_functions",
    "theta_join_nation_pairs",
    "token_budget_shards",
    "token_count_by_source",
    "topk_expensive_orders",
    "training_data_pipeline",
    "user_lifetime_stats",
    "vector_norms",
    "window_rank_orders",
    # -- freshest driver row is round 5 (fill to the cap) --------------------
    "approx_quantity_percentiles",
    "asof_join_last_purchase",
    "balanced_mixture_sample",
    "bm25_rank_docs",
    "bpe_token_count",
    "cdc_chunk_stats",
    "common_ngram_fraction",
    "duplicate_passage_report",
    "embedding_neardup_ivf",
    "event_gap_stats",
    "explode_part_words",
    "grouping_sets_priority",
    "latest_event_per_user",
    "lexical_diversity_by_source",
    "minhash_lsh_neardup",
    "pii_scrub",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q20_excess_shippers",
    # ---- 50-cap boundary: names below spill to the r13 window -------------
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "rare_token_fraction",
    "repetition_score",
    "skew_salted_join_agg",
    "sliding_window_chunks",
    "stratified_sample_docs",
    "streaming_lsh_candidates",
    "tfidf_top_terms",
    "token_budget_shards_scaled",
    "token_frequency_topk",
    "token_length_histogram",
    "training_corpus_build",
    "tumbling_window_events",
    "unpivot_flag_metrics",
    "upsert_latest_orders",
    "wav_decode_features",
    "winnowing_fingerprints",
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
