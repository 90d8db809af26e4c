"""Hand-computed cases for the behavioral-analytics operators
(`operators/behavior.py`)."""

from __future__ import annotations

from datetime import datetime

import pytest

from national_caseload_data_ingest_spark.operators.behavior import funnel


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


def test_funnel_requires_strict_order(spark):
    events = spark.createDataFrame(
        [
            # u1 completes the whole funnel in order
            (1, 1, "view", _ts(1, 0)),
            (2, 1, "click", _ts(1, 1)),
            (3, 1, "purchase", _ts(1, 2)),
            # u2 clicks BEFORE viewing → click doesn't count
            (4, 2, "click", _ts(1, 0)),
            (5, 2, "view", _ts(1, 1)),
            # u3 views only
            (6, 3, "view", _ts(1, 0)),
            # u4 purchases with no view at all → not even step 1
            (7, 4, "purchase", _ts(1, 0)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {
        r["step"]: (r["step_name"], r["users"], r["conversion"])
        for r in funnel(events, ("view", "click", "purchase")).collect()
    }
    assert got[1] == ("view", 3, pytest.approx(1.0))
    assert got[2] == ("click", 1, pytest.approx(1 / 3))
    assert got[3] == ("purchase", 1, pytest.approx(1 / 3))


def test_funnel_same_timestamp_not_counted(spark):
    """ts > prev_ts is strict: a click at the exact view instant doesn't
    advance the funnel."""
    events = spark.createDataFrame(
        [
            (1, 1, "view", _ts(1, 0)),
            (2, 1, "click", _ts(1, 0)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {r["step"]: r["users"] for r in funnel(events, ("view", "click")).collect()}
    assert got == {1: 1, 2: 0}


def test_cohort_retention_math(spark):
    import os
    import tempfile

    from national_caseload_data_ingest_spark.operators.behavior import (
        daily_cohort_retention,
    )

    events = spark.createDataFrame(
        [
            # cohort day 1: users 1, 2.  user 1 returns day 2; both day 3
            (1, 1, "view", _ts(1)),
            (2, 2, "view", _ts(1)),
            (3, 1, "click", _ts(2)),
            (4, 1, "view", _ts(3)),
            (5, 2, "view", _ts(3)),
            # cohort day 2: user 3, never returns
            (6, 3, "view", _ts(2)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    with tempfile.TemporaryDirectory() as td:
        events.write.parquet(os.path.join(td, "events.parquet"))
        rows = {
            (r["cohort_day"], r["day_offset"]): (
                r["active_users"],
                r["cohort_size"],
                r["retention"],
            )
            for r in daily_cohort_retention(spark, td).collect()
        }
    assert rows[("2024-01-01", 0)] == (2, 2, pytest.approx(1.0))
    assert rows[("2024-01-01", 1)] == (1, 2, pytest.approx(0.5))
    assert rows[("2024-01-01", 2)] == (2, 2, pytest.approx(1.0))
    assert rows[("2024-01-02", 0)] == (1, 1, pytest.approx(1.0))
    assert len(rows) == 4


def test_outliers_flag_only_beyond_3_mad(spark):
    import os
    import tempfile

    from national_caseload_data_ingest_spark.operators.behavior import (
        event_value_outliers,
    )

    # values 1..9 plus a 100 spike: median 5.5, MAD 2.5 → |v-5.5|>7.5
    # flags only the spike (and nothing in 1..9)
    vals = [float(v) for v in range(1, 10)] + [100.0]
    events = spark.createDataFrame(
        [(i, 1, "t", _ts(1), v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    with tempfile.TemporaryDirectory() as td:
        events.write.parquet(os.path.join(td, "events.parquet"))
        rows = event_value_outliers(spark, td).collect()
    assert [r["value"] for r in rows] == [100.0]
    r = rows[0]
    assert r["med"] == pytest.approx(5.5)
    assert r["mad"] == pytest.approx(2.5)
    assert r["robust_z"] == pytest.approx((100.0 - 5.5) / 2.5)
