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
# the whole catalog.  Round-9 rotation (VERDICT r8 ask #2 — r8 never
# executed the planned rotation, so the r2/r4-stale backlog leads now):
#
# 1. round-10 NEW or semantics-changed queries lead (22 of them — the
#    codec sweep, the container walks, web curation, DSIR/WordPiece);
#    their driver rows must reflect current behavior;
# 2. the round-9-fresh block (int8/binary ANN, spans, animations);
# 3. the 10 queries whose freshest driver row is ROUND 2;
# 4. the round-4 backfill in name order — whatever spills past the
#    50-cap (32 names this round) leads the round-11 window; the spill
#    is covered every round by the local full-catalog replay at sf0.01
#    and sf0.1 (tools/check_oracle.py; this round: 224/224 at sf0.01,
#    see COVERAGE.md for the close-sweep numbers).
CHECK_PRIORITY: list[str] = [
    # -- round-10: new or semantics changed this round -----------------------
    "vp8_decode_features",  # lossy-WebP VP8 key-frame decode E2E (new)
    "kmeans_int8_assign",  # integer Lloyd's with a full value oracle (new)
    "dsir_importance_weights",  # hashed-bigram DSIR weights (new)
    "dsir_selected_docs",  # DSIR top-k selection cut (new)
    "wordpiece_tokenize_docs",  # greedy matcher with a recursive-CTE oracle (new)
    "corpus_shuffle_index",  # epoch-seeded global permutation + shards (new)
    "compression_ratio_quality",  # zlib repetition signal, rows-only (new)
    "codec_gate_report",  # 8 classes now: inter-VP8 + inter-AVI gates (changed)
    "bmp_ext_decode_features",  # 1/4-bpp, BI_RLE8/4, 32-bpp BGRX (new)
    "tiff_ext_decode_features",  # paletted/tiled/planar-2 layouts (new)
    "mp3_stream_features",  # MPEG-audio frame walk + byte accounting (new)
    "ogg_stream_features",  # Ogg page walk, real CRCs, codec census (new)
    "warc_record_features",  # Common Crawl container walk (new)
    "avro_roundtrip_events",  # timestamp-micros logical type (new)
    "url_canonical_features",  # crawl-manifest canonicalization (new)
    "domain_doc_counts",  # registered-domain rollup (new)
    "ico_decode_features",  # favicon container: DIB + PNG entries (new)
    "png_palette_decode_features",  # color-type-3 sub-byte + tRNS (new)
    "png_depth_decode_features",  # 16-bit + sub-byte grayscale (new)
    "png_decode_features",  # Adam7 interlace + weighted_sum column (changed)
    "flac_audio_features",  # depth + 1-8 channel-layout rotation (changed)
    "containment_quote_pairs",  # prefix-filtered tier past budget (changed)
    "global_order_index",  # single-plan ReusedExchange, no persist (changed)
    "gif_animation_features",  # truncation hardening + anim routing (changed)
    # -- round-9: still freshest for these ----------------------------------
    "embedding_int8_quantize",  # global-scale int8 codes, exact stats
    "ann_int8_topk",  # int8 MIPS with a full value oracle
    "ann_binary_topk",  # 1-bit sign + Hamming, full value oracle
    "repeated_span_report",  # exact substring-dedup spans, Lee et al. style
    "webp_animation_features",  # VP8X/ANIM/ANMF compositing E2E
    "webp_decode_features",  # VP8L mode-13 predictor fixed (r9)
    "mjpeg_frame_features",  # AVI walk video-only kinds (r9)
    "heavy_hitter_tokens",  # MG pass-1 vectorized in r9
    # -- freshest driver row is round 2 ------------------------------------
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
    # -- freshest driver row is round 4 (first ~36 fit under the cap) ------
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
