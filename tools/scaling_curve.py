"""Measured sf0.1 -> sf1 scaling curve for the top-10 heavy queries
(VERDICT r10 ask #5).

Runs each query once warm (after a cold warm-up run at sf0.1 to pay
JIT/Arrow init) at both scales, records wall seconds and the observed
exponent log10(t_sf1 / t_sf01) (rows scale 10x, so exponent 1.0 =
linear, 2.0 = quadratic), and prints one JSON line.  Results land in
SCALING.md's measured-curve table.

Usage: python tools/scaling_curve.py [sf1_dir]
       python tools/scaling_curve.py BASE_DIR BIG_DIR [query ...]

The two-dir form measures a matched corpus-regime pair (e.g. the
Heaps-law long-tail variants from ``gen_sf1.py --tail-frac``), limited
to the named queries.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIES = [
    "neardup_pagerank",
    "training_corpus_build",
    "ppjoin_neardup_pairs",
    "unigram_tokenize_docs",
    "ann_pq_topk",
    "minhash_lsh_neardup",
    "containment_quote_pairs",
    "dsir_importance_weights",
    "corpus_shuffle_index",
    "bootstrap_order_value_ci",
]


def main() -> None:
    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.session import get_spark

    args = sys.argv[1:]
    if len(args) >= 2:
        sf01, sf1 = args[0], args[1]
        names = args[2:] or HEAVIES
    else:
        sf01 = "/root/testdata/sf0.1"
        sf1 = args[0] if args else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_sf1",
        )
        names = HEAVIES
    spark = get_spark("scaling")
    q = ent.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = q[name]
        fn(spark, sf01).count()  # warm-up (plan cache, Arrow, JIT)
        t0 = time.time()
        n01 = fn(spark, sf01).count()
        t01 = time.time() - t0
        t0 = time.time()
        n1 = fn(spark, sf1).count()
        t1 = time.time() - t0
        exp = math.log10(t1 / t01) if t01 > 0 else float("nan")
        out[name] = {
            "sf0.1_sec": round(t01, 2),
            "sf1_sec": round(t1, 2),
            "rows_sf0.1": n01,
            "rows_sf1": n1,
            "observed_exponent": round(exp, 2),
        }
        print(name, out[name], flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"scaling_curve": out}))


if __name__ == "__main__":
    main()
