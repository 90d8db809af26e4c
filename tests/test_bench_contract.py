"""Pin the bench's driver-facing stdout contract (VERDICT r14 ask #7).

The round driver captures only a byte-bounded TAIL of bench stdout; the
r13 close lost its round-over-round comparison because the one-line
record's head fell outside that window.  ``bench.compact_record`` is the
LAST line printed, so its serialized size must stay well under the
observed capture window (>= ~3.5 KB in the r14 driver artifact) with
headroom for catalog growth.
"""

from __future__ import annotations

import json

import bench


def _record(names) -> dict:
    queries = {n: 123.456 for n in names}
    return {
        "metric": "headline_queries_total",
        "value": 12345.678,
        "unit": "sec",
        "queries_median": queries,
        "queries": queries,
        "clean_total": 12345.678,
        "steal_dirty": list(queries)[: len(queries) // 2],
        "window_dirty": True,
        "sf": 0.1,
    }


def test_compact_line_fits_driver_tail_at_current_catalog():
    # the real headline list plus the dedup_* extras the bench appends
    names = list(bench.HEADLINE) + ["dedup_exact", "dedup_exact_survivors"]
    line = json.dumps(bench.compact_record(_record(names)))
    assert len(line) < 2700, f"compact line {len(line)} B risks tail clipping"


def test_compact_line_has_headroom_for_catalog_growth():
    # 14 more queries at the catalog's longest current name (33 chars)
    # must still clear the observed >= ~3.5 KB capture window
    names = list(bench.HEADLINE) + ["dedup_exact", "dedup_exact_survivors"]
    names += [f"future_headline_query_name_{i:04d}" for i in range(14)]
    line = json.dumps(bench.compact_record(_record(names)))
    assert len(line) < 3400, f"compact line {len(line)} B at 82 queries"


def test_compact_line_keeps_the_contract_fields():
    rec = _record(["q1_pricing_summary", "q6_revenue_forecast"])
    out = bench.compact_record(rec)
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.1
    assert set(out["queries"]) == set(rec["queries_median"])
    # steal-dirty NAMES are folded to a count in the compact line (the
    # full record and side file keep the list)
    assert out["n_steal_dirty"] == len(rec["steal_dirty"])
    assert "steal_dirty" not in out
