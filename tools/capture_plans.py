"""Capture ``explain('formatted')`` for bench headline queries.

Usage::

    python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` (suffix default ``before``)
for every bench HEADLINE query (or the named subset).  Plans are the
PRE-EXECUTION formatted physical plans (AdaptiveSparkPlan initial),
which is what the optimization round's plan-diff evidence wants:
exchange count, join strategy, PushedFilters/ReadSchema, and the
Python-boundary nodes are all visible before AQE re-planning.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "plans", "r14")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]

    import __spark_entry__ as ent
    from bench import HEADLINE
    from national_caseload_data_ingest_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    qs = ent.queries()
    names = only or [n for n in HEADLINE if n in qs]
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, "ok" if not text.startswith("PLAN CAPTURE FAILED") else "FAIL")


if __name__ == "__main__":
    main()
