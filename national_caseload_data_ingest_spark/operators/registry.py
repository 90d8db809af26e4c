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
# the whole catalog.  Round-7 rotation policy (per VERDICT r6 item 3):
#
# 1. round-7 NEW or SEMANTICS-CHANGED queries lead (they have no row for
#    their current behavior) — including cms_token_counts, the only query
#    with no driver row in ANY round, and customers_buying_all_core_parts,
#    whose divisor was retuned from top-5 parts (vacuous 0-row match) to
#    the constant-cardinality brand domain (non-empty at every SF);
# 2. then the 14 queries whose freshest driver row is ROUND 2
#    (approx_distinct .. window_running_total below) — with 35 round-7
#    entries ahead of them, only the first ~10 fit under the 50-cap; the
#    spilled four lead the round-8 window;
# 3. then the 43 whose freshest row is ROUND 4, in name order — the tail
#    past the 50-cap (plus the r5/r6 sets) is covered by the local
#    full-catalog replay at sf0.01 AND sf0.1 (tools/check_oracle.py,
#    COVERAGE.md) and follows in round 8.
#
# Entries past the driver's 50-cap are deliberately listed so the order is
# already the round-8 plan.
CHECK_PRIORITY: list[str] = [
    # -- round-7: new or semantics-changed this round -----------------------
    "jpeg420_decode_features",  # native chroma-subsampled JPEG E2E (new)
    "jpeg_progressive_decode_features",  # native SOF2 multi-scan E2E (new)
    "ppjoin_neardup_pairs",  # threshold+planner change (r7) — re-certify
    "set_except_cheap_orders",  # non-vacuous EXCEPT gate (new)
    "set_except_all_priorities",  # EXCEPT ALL bag semantics (new)
    "set_intersect_all_priorities",  # INTERSECT ALL bag semantics (new)
    "window_value_functions",  # first/nth/last_value, percent_rank, cume_dist (new)
    "map_functions_priority",  # map_from_entries/element_at/map_keys round-trip (new)
    "tiff_decode_features",  # native TIFF strips/LZW/PackBits/predictor E2E (new)
    "webp_decode_features",  # native VP8L lossless WEBP E2E (new)
    "mjpeg_frame_features",  # AVI container + decoded frame sampling (new)
    "g711_audio_features",  # mu-law/A-law exact expansion E2E (new)
    "adpcm_audio_features",  # IMA ADPCM vs recursive-CTE state twin (new)
    "lm_kneser_ney_perplexity",  # interpolated KN smoothing (new)
    "neardup_kcore",  # iterative k-core peel vs unrolled-CTE twin (new)
    "flac_audio_features",  # native FLAC subset decode E2E (new)
    "c4_line_filter",  # C4 line rules over constructed lines (new)
    "line_dedup_survivors",  # corpus-wide exact line dedup (new)
    "keyword_tag_docs",  # Aho-Corasick multi-pattern counts (new)
    "sequence_pack_docs",  # next-fit packing vs recursive-CTE twin (new)
    "link_customer_records_jw",  # Jaro-Winkler ER vs DuckDB's builtin (new)
    "ewma_daily_revenue",  # banded-bucket weighted rollup, exact weights (new)
    "heavy_hitter_tokens",  # two-pass Misra-Gries exact frequent items (new)
    "neardup_labelprop",  # synchronous LPA vs unrolled-CTE twin (new)
    "nfc_normalize_docs",  # Unicode NFC vs DuckDB nfc_normalize (new)
    "golden_customer_records",  # ER survivorship E2E vs CTE twin (new)
    "zorder_orders_layout",  # Morton clustering key, shared bit algebra (new)
    "hrw_shard_routing",  # rendezvous-hash router vs md5 argmax twin (new)
    "source_token_drift",  # per-source KL + entropy, quantized-sum (new)
    "gopher_quality_filter",  # Gopher rule battery, integer-exact flags (new)
    "tar_roundtrip_documents",  # POSIX ustar member-per-doc codec (new)
    "ann_pq_topk",  # product-quantization ANN, rows-only + recall tests (new)
    "unigram_tokenize_docs",  # unigram-LM tokenizer, distributed EM (new)
    "bootstrap_order_value_ci",  # deterministic Poisson bootstrap (new)
    "bloom_pruned_join_revenue",  # runtime-filter join, plain-join oracle (new)
    "mrl_price_quantiles",  # MRL rank sketch with error certificate (new)
    "matryoshka_prefix_recall",  # prefix-dim truncation eval, full oracle (new)
    "alpha_mixture_allocation",  # n^0.5 source reweighting, exact Hamilton (new)
    "neardup_link_prediction",  # common-neighbor Jaccard, integer-exact (new)
    "conjunctive_term_search",  # boolean AND retrieval, scan-pushed (new)
    "phrase_search_positions",  # positional phrase intersect (new)
    "cms_token_counts",  # the 1/160 query with no driver row in any round
    "customers_buying_all_core_parts",  # division retuned: brand-domain divisor
    "q18_large_orders",  # broadcast hint dropped (r6 weak item) — re-certify
    "q5_local_supplier_volume",  # supplier unhinted — re-certify
    "q3_shipping_priority",  # customer unhinted — re-certify
    # -- freshest driver row is round 2 ------------------------------------
    "approx_distinct_parts",
    "cross_join_region_status",
    "dedup_exact_survivors",
    "having_supplier_volume",
    "in_subquery_rich_customers",
    "multimodal_frame_sample",
    "pivot_line_status",
    "q10_returned_items",
    "set_except_nations",
    "set_intersect_nations",
    "simhash_neardup",
    "sliding_window_events",
    "window_ntile_share",
    "window_running_total",
    # -- freshest driver row is round 4 ------------------------------------
    "ann_ivf_topk",
    "ann_lsh_topk",
    "anti_join_customers_no_orders",
    "array_agg_order_keys",
    "conditional_case",
    "cosine_topk_bruteforce",
    "cube_returnflag_status",
    "date_functions",
    "decontaminate_overlap",
    "dedup_exact",
    "distinct_part_counts",
    "doc_fingerprint",
    "embedding_cosine_neardup",
    "events_enriched_segment",
    "exists_correlated_heavy_parts",
    "full_outer_nation_activity",
    "json_extract_events",
    "lang_id_heuristic",
    "math_functions",
    "median_quantity_by_flag",
    "multimodal_byte_features",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "outer_join_order_counts",
    "q6_revenue_forecast",
    "quality_score",
    "range_join_value_bins",
    "rollup_region_nation",
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
