"""Ad-hoc subset timer for A/B work inside an optimization round.

Same methodology as bench.py (count() action on the registered query,
min of N runs, per-run /proc/stat steal fractions reported) but over an
explicit query list, so a change can be measured without paying a full
headline sweep.  NOT the driver contract — bench.py stays the artifact
of record.

Usage::

    python tools/time_subset.py [sf_dir] query [query ...]
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
    argv = list(sys.argv[1:])
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.1"
    names = argv[1:] if argv and os.path.isdir(argv[0]) else argv

    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.session import get_spark

    spark = get_spark("time-subset")
    qs = ent.queries()
    qs["q6_revenue_forecast"](spark, sf_dir).count()  # warm

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"subset: {name}")
        samples = []
        for _ in range(runs):
            c0 = _cpu_sample()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            elapsed = time.time() - t0
            d = _cpu_delta(c0, _cpu_sample())
            samples.append((round(elapsed, 3),
                            d["steal_frac"] if d else None))
        clean = [s for s, f in samples if f is not None and f < 0.005]
        out[name] = {
            "min": min(s for s, _ in samples),
            "clean_min": min(clean) if clean else None,
            "samples": samples,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
