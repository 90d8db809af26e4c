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
# the whole catalog: after round 5 every one of the 109 then-registered
# queries had at least one driver row, so the risk is now STALENESS, not
# coverage.  Round 6 therefore front-loads the never-driver-checked round-6
# operators (9), then, in oldest-row-first order, the 16 whose last row is
# round 2, then 25 of the 43 whose last row is round 4.  The 18
# round-4-checked queries that don't fit the 50-cap — simple scalar-
# function/set/collection/events queries with three consecutive green
# rounds behind them (string/date/math/conditional functions, vector_norms,
# distinct_part_counts, set_union_all_party_nations, topk_expensive_orders,
# array_agg_order_keys, json_extract_events, session_window_events,
# user_lifetime_stats, events_enriched_segment, signup_purchase_within_hour,
# doc_fingerprint, median_quantity_by_flag, token_count_by_source,
# quality_score) — are deferred to the local
# full-catalog replay (tools/check_oracle.py, same check, run at BOTH
# sf0.01 and sf0.1 this round; COVERAGE.md records it) and are first in
# line for the round-7 window.
CHECK_PRIORITY: list[str] = [
    # -- round-6 new operators (never driver-checked) ----------------------
    "gif_decode_features",  # native GIF/LZW decode E2E
    "jpeg_decode_features",  # native baseline-JPEG decode E2E
    "semdedup_survivors",  # rows-only by design (model-seeded)
    "bpe_train_encode",  # rows-only by design (corpus-derived model)
    "decontaminate_bloom",
    "html_extract_text",
    "orc_roundtrip_lineitem",
    "csv_roundtrip_documents",
    "json_roundtrip_documents",
    # -- freshest driver row is round 2 ------------------------------------
    "window_running_total",
    "window_ntile_share",
    "pivot_line_status",
    "sliding_window_events",
    "dedup_exact_survivors",
    "simhash_neardup",  # rows-only by design (hash-seeded)
    "multimodal_frame_sample",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q18_large_orders",
    "set_intersect_nations",
    "set_except_nations",
    "approx_distinct_parts",  # rows-only by design (approximate)
    "having_supplier_volume",
    "in_subquery_rich_customers",
    "cross_join_region_status",
    # -- freshest driver row is round 4 ------------------------------------
    "window_rank_orders",
    "cube_returnflag_status",
    "rollup_region_nation",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "embedding_cosine_neardup",
    "training_data_pipeline",
    "neardup_clusters",
    "decontaminate_overlap",
    "token_budget_shards",
    "multimodal_byte_features",
    "q3_shipping_priority",
    "q6_revenue_forecast",
    "semi_join_urgent_customers",
    "anti_join_customers_no_orders",
    "outer_join_order_counts",
    "full_outer_nation_activity",
    "scalar_subquery_above_avg",
    "exists_correlated_heavy_parts",
    "theta_join_nation_pairs",
    "range_join_value_bins",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",  # rows-only by design (hash-seeded)
    "ann_ivf_topk",  # rows-only by design (model-seeded)
    "lang_id_heuristic",
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
