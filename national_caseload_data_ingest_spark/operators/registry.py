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
# the whole catalog.  Round-11 rotation (VERDICT r10 ask #4 — the round-4
# backlog spill leads, plus the one never-driver-checked query):
#
# 1. round-11 NEW or semantics-changed queries lead (block grows during
#    the round as operators land);
# 2. ``wordpiece_train_encode`` — the only catalog entry with no driver
#    row in any CORRECTNESS_r*.json;
# 3. the 15 queries whose freshest driver row is ROUND 4 (the promised
#    backlog spill), in name order;
# 4. round-5-stale fill in name order up to the 50-cap; whatever spills
#    is covered by the local full-catalog replay at sf0.01 and sf0.1
#    (tools/check_oracle.py; see COVERAGE.md close-sweep numbers).
CHECK_PRIORITY: list[str] = [
    # -- round-11: new or semantics changed this round ----------------------
    "avro_nested_roundtrip",  # recursive record/array/map codec (new)
    "avro_union_roundtrip",  # enum/fixed/multi-branch unions (new)
    "txlog_time_travel",  # transaction-log snapshots + checkpoint (new)
    "merge_apply_changes",  # multi-clause MERGE / CDC apply (new)
    "html_link_graph",  # anchor extraction + inlink rollup (new)
    "msgpack_roundtrip_events",  # pure-stdlib MessagePack codec (new)
    "readability_scores",  # Flesch/LIX integer-exact banding (new)
    "ip_cidr_filter",  # prefix-bucketed CIDR screen (new)
    "robots_txt_allow",  # RFC 9309 REP evaluation (new)
    "protobuf_roundtrip_events",  # protobuf wire-format codec (new)
    "sqlite_roundtrip_documents",  # native SQLite file reader (new)
    "txlog_change_feed",  # CDF between table versions (new)
    "cbor_roundtrip_events",  # RFC 8949 CBOR codec (new)
    "wordpiece_efficiency_by_source",  # tokenizer fertility rollup (new)
    "access_log_features",  # combined-log-format parse (new)
    "mime_message_features",  # RFC 5322/MIME parser (new)
    "mbox_thread_features",  # mboxrd framing + thread census (new)
    "cdc_chunk_features",  # content-defined chunking, CTE oracle (new)
    "k_anonymity_report",  # re-identification audit (new)
    "quarantine_orders",  # row-level dead-letter split (new)
    "json_schema_infer",  # semi-structured type-drift census (new)
    "unicode_script_profile",  # script-mix routing census (new)
    "soundex_part_blocks",  # phonetic ER blocking (new)
    "jcs_canonical_dedup",  # RFC 8785 canonical-JSON dedup (new)
    "l_diversity_report",  # homogeneity-attack audit (new)
    "rake_keyword_scores",  # RAKE keyword extraction (new)
    "attribution_last_touch",  # revenue attribution as-of pick (new)
    "benford_price_screen",  # first-digit forensics audit (new)
    "crawl_corpus_build",  # E2E crawl curation composition (new)
    "curriculum_order_index",  # banded shuffle + global index (new)
    "git_pack_features",  # native git packfile walk (new)
    "snappy_roundtrip_documents",  # native snappy decode (new)
    "txlog_footer_skipping",  # footer-backfilled data skipping (new)
    "zip_member_features",  # native ZIP walk, CRC-verified (new)
    "pdf_text_features",  # PDF subset text extraction (new)
    "txlog_data_skipping",  # min-max file pruning (new)
    "warc_record_features",  # chunked + gzip wire encodings (changed)
    "mp3_stream_features",  # free-format inference rotation (changed)
    "codec_gate_report",  # class 8 gated->decoded transition (changed)
    "wordpiece_tokenize_docs",  # total oracle + ASCII-ws kernel (changed)
    "ogg_stream_features",  # spanning-BOS reassembly (changed)
    "avro_roundtrip_events",  # codec internals refactored (re-check)
    "containment_quote_pairs",  # dense bitset tier + int-id oracle (changed)
    "webdataset_shard_features",  # native ustar walk + WDS samples (new)
    "qoi_decode_features",  # QOI codec, all five op classes (new)
    "archive_codec_features",  # zlib/gzip/bz2/xz sniff + decompress (new)
    "mojibake_repair_docs",  # ftfy-style double-encoding repair (new)
    "invisible_scrub_docs",  # zero-width/format char scrub (new)
    # -- never driver-checked ------------------------------------------------
    "wordpiece_train_encode",
    # -- freshest driver row is round 4 --------------------------------------
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
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "rare_token_fraction",
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
