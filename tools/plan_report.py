"""Physical-plan audit across the whole query catalog.

For every ``queries()`` entry, prints one line:

    name  shuffles=N  joins=[...]  pushdown=y/n  codegen=N  takeordered=y/n

Flags (trailing ``!``) anything that usually signals a scale problem: a
CartesianProduct, or a shuffle count ≥ 5.  This is the human-readable twin
of ``tests/test_plans.py`` — run it after adding an operator to see the
plan you actually got.

Usage::

    python tools/plan_report.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# A single query gets 4 shuffles before it's suspect.  Composed pipelines
# get an explicit per-query budget instead of a blanket opt-out, so a
# regression past today's tuned plan still flags:
# training_corpus_build's 5 = dedup groupBy + lang-block kernel +
# eval-gram distinct + contamination groupBy + per-lang window, with
# every join broadcast.
DEFAULT_SHUFFLE_BUDGET = 4
SHUFFLE_BUDGET = {
    "training_corpus_build": 5,
    # the crawl-band E2E composition's 6 = the robots-kernel fan_out
    # repartition + the two doc_id gate joins' exchanges + the
    # survivors' text-keyed dedup window + the kept/dropped aggregates;
    # every dimension join is broadcast (the BHJ×5 in the plan line)
    "crawl_corpus_build": 6,
    # tfidf deliberately carries NO broadcast hint on the vocabulary join
    # (web-scale vocabularies can exceed broadcast limits — VERDICT r4 #3);
    # the 5th exchange is the tf-side tok shuffle that a forced broadcast
    # used to elide.  AQE still promotes the df side to broadcast at
    # runtime when it is actually small and the local shuffle reader then
    # serves the probe side without network movement.
    "tfidf_top_terms": 5,
    # round-6 composed pipelines — each count is the tuned plan, so a
    # regression past it still flags:
    # lm_perplexity's 6 = bigram-count groupBy + context groupBy + vocab
    # countDistinct (2-phase) + model shuffle join + per-doc final agg —
    # the price of keeping the LM a DISTRIBUTED relation instead of a
    # broadcast vocabulary (the scale-correct choice, see lm.py).
    "lm_perplexity": 6,
    # funnel's 7 = three per-step user-keyed groupBys + three one-row
    # step-count aggregates (single-partition exchanges) + the union;
    # step joins are all broadcast (step relations shrink monotonically).
    "funnel_view_click_purchase": 7,
    # cohort's 6 = activity distinct + per-user cohort agg + cohort-size
    # agg + final (cohort, offset) countDistinct (2-phase expand);
    # all joins broadcast.
    "daily_cohort_retention": 6,
    # five independent validation rules = five aggregate exchanges + the
    # dup-key groupBy; each rule is one scan-bounded pass by design.
    "validate_orders_constraints": 6,
    # the estimator itself is two bucket-stat aggregates (2-phase
    # countDistinct each); the 5th exchange is the TRUE join-size audit
    # column, which exists only to measure the estimator's error — a
    # production CBO reads the stats relation alone (2 exchanges).
    "join_size_estimate_customer_orders": 5,
    # interpolated KN keeps the MODEL DISTRIBUTED (the lm.py scale
    # contract): 10 = bigram-count groupBy + context groupBy + the
    # continuation relation's 2-phase distinct-then-count + TWO one-row
    # totals that are each a 2-phase global distinct (n1p_all over
    # bigrams, v over tokens) + the final per-doc agg.  Every model
    # relation reaches the held-out stream via AQE-chosen joins; the
    # only forced broadcast is the one-row totals.
    "lm_kneser_ney_perplexity": 10,
    # drift's 6 = the (source, token) partial-combined agg + source-total
    # agg + token-marginal agg + the token-keyed model join exchange +
    # the one-row corpus total + the final per-source sum.  Every
    # exchange after the first moves the vocabulary-sized count relation,
    # never raw tokens (lexical_diversity contract); the tok join stays a
    # shuffle join deliberately — web-scale vocabularies exceed broadcast
    # limits (VERDICT r4 #3).
    "source_token_drift": 6,
    # DSIR's 5 = target-gram bucket agg + pool-gram bucket agg (each
    # bounded at DSIR_BUCKETS=4096 rows after the map-side combine) +
    # the per-doc gram groupBy + the doc-id-keyed left join (primary-key
    # shape) + the final agg; the smoothed model itself joins BROADCAST
    # (<=4096 rows by construction, selection.py).  No exchange moves
    # raw text.
    "dsir_importance_weights": 5,
    # the selection cut adds TakeOrderedAndProject on top of the same
    # weight plan — same exchanges, no extra data movement.
    "dsir_selected_docs": 5,
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.plans import (
        codegen_span_count,
        has_take_ordered,
        join_kinds,
        physical_plan,
        pushed_filters,
        shuffle_exchanges,
    )
    from national_caseload_data_ingest_spark.session import get_spark

    spark = get_spark("plan-report")
    qs = ent.queries()
    flagged = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            df.collect()  # execute THIS plan so AQE finalizes + codegen runs
            plan = physical_plan(df)
            joins = join_kinds(df)
            n_shuffles = len(shuffle_exchanges(df))
            pushed = any(p.strip() for p in pushed_filters(df))
            codegen = codegen_span_count(df)
            flags = []
            if "CartesianProduct" in joins and name != "cross_join_region_status":
                flags.append("CARTESIAN")
            if n_shuffles > SHUFFLE_BUDGET.get(name, DEFAULT_SHUFFLE_BUDGET):
                flags.append("MANY_SHUFFLES")
            if flags:
                flagged.append((name, flags))
            jshort = ",".join(
                j.replace("BroadcastHashJoin", "BHJ")
                .replace("SortMergeJoin", "SMJ")
                .replace("ShuffledHashJoin", "SHJ")
                .replace("BroadcastNestedLoopJoin", "BNLJ")
                .replace("CartesianProduct", "CARTESIAN")
                for j in joins
            )
            print(
                f"{name:35s} shuffles={n_shuffles} joins=[{jshort}] "
                f"pushdown={'y' if pushed else 'n'} codegen={codegen} "
                f"takeordered={'y' if has_take_ordered(df) else 'n'}"
                f"{'  ! ' + ','.join(flags) if flags else ''}"
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:35s} ERROR {type(e).__name__}: {e}")
            flagged.append((name, ["ERROR"]))
    print()
    if flagged:
        print(f"{len(flagged)} flagged: {flagged}")
    else:
        print("0 flagged")


if __name__ == "__main__":
    main()
