"""Timed full-catalog sweep: one count() per registered query at the
given SF with per-run steal fractions — the audit that found the
profile/DSIR/linkage/basket single-task pathologies in r14 (§17).

Usage::

    python tools/catalog_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _cpu_delta, _cpu_sample  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/catalog_sweep.json"

    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.session import get_spark

    spark = get_spark("catalog-sweep")
    qs = ent.queries()
    qs["q6_revenue_forecast"](spark, sf_dir).count()

    rows = {}
    t_start = time.time()
    for name in sorted(qs):
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        c0 = _cpu_sample()
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).count()
            err = None
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"
        elapsed = round(time.time() - t0, 3)
        d = _cpu_delta(c0, _cpu_sample())
        rows[name] = {
            "sec": elapsed,
            "steal_frac": d["steal_frac"] if d else None,
            **({"error": err} if err else {}),
        }
        print(json.dumps({name: rows[name]}), flush=True)
    total = round(time.time() - t_start, 3)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "total_sec": total, "queries": rows},
                  f, indent=1)
    print(json.dumps({"total_sec": total, "n": len(rows)}))


if __name__ == "__main__":
    main()
