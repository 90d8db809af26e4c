"""Hand-computed cases for the time-series operators
(`operators/timeseries.py`)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.timeseries import (
    scd2_intervals,
)


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_scd2_collapses_consecutive_states(spark):
    events = spark.createDataFrame(
        [
            (1, 10, "a", _ts(0)),
            (2, 10, "a", _ts(1)),  # same state → collapsed
            (3, 10, "b", _ts(2)),  # change
            (4, 10, "a", _ts(3)),  # change back → NEW interval (type-2)
            (5, 20, "x", _ts(0)),  # other user
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = sorted(
        scd2_intervals(events).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    got = [
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in rows
    ]
    assert got == [
        (10, "a", _ts(0), _ts(2), False),
        (10, "b", _ts(2), _ts(3), False),
        (10, "a", _ts(3), None, True),
        (20, "x", _ts(0), None, True),
    ]


def test_scd2_tiebreak_same_timestamp(spark):
    """Equal timestamps order by event_id, so the interval chain is
    deterministic."""
    events = spark.createDataFrame(
        [
            (2, 1, "b", _ts(0)),
            (1, 1, "a", _ts(0)),  # same ts, lower id → first
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = sorted(scd2_intervals(events).collect(), key=lambda r: r["valid_from"] or _ts(23))
    states = [(r["state"], r["is_current"]) for r in rows]
    assert states == [("a", False), ("b", True)]


def test_gapfill_fills_and_forward_fills(spark):
    from national_caseload_data_ingest_spark.operators.timeseries import (
        events_hourly_gapfill,
    )
    import os
    import tempfile

    events = spark.createDataFrame(
        [
            (1, "t", _ts(0, 30), 10.0, 100),
            (2, "t", _ts(0, 45), 20.0, 100),
            # hour 1 silent
            (3, "t", _ts(2, 10), 30.0, 100),
        ],
        "event_id long, event_type string, ts timestamp, value double, user_id long",
    )
    with tempfile.TemporaryDirectory() as td:
        events.write.parquet(os.path.join(td, "events.parquet"))
        rows = {
            r["hour"].hour: r
            for r in events_hourly_gapfill(spark, td).collect()
        }
    assert set(rows) == {0, 1, 2}
    assert rows[0]["sum_value"] == 30.0 and rows[0]["n_events"] == 2
    assert not rows[0]["gap_filled"]
    assert rows[0]["ffill_avg_value"] == pytest.approx(15.0)
    assert rows[1]["sum_value"] == 0.0 and rows[1]["n_events"] == 0
    assert rows[1]["gap_filled"]
    assert rows[1]["ffill_avg_value"] == pytest.approx(15.0)  # carried
    assert rows[2]["ffill_avg_value"] == pytest.approx(30.0)


def test_rolling_range_frame_is_time_based(spark):
    import os
    import tempfile

    from national_caseload_data_ingest_spark.operators.timeseries import (
        rolling_hour_user_value,
    )

    events = spark.createDataFrame(
        [
            (1, 1, _ts(0, 0, 0), 1.0, "t"),
            (2, 1, _ts(0, 30, 0), 2.0, "t"),
            (3, 1, _ts(1, 0, 0), 4.0, "t"),   # exactly 3600s after e1 → incl
            (4, 1, _ts(2, 30, 0), 8.0, "t"),  # alone in its window
        ],
        "event_id long, user_id long, ts timestamp, value double, event_type string",
    )
    with tempfile.TemporaryDirectory() as td:
        events.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r["event_id"]: (r["roll_sum"], r["roll_cnt"])
            for r in rolling_hour_user_value(spark, td).collect()
        }
    assert got[1] == (1.0, 1)
    assert got[2] == (3.0, 2)
    assert got[3] == (7.0, 3)  # inclusive 1-hour bound keeps e1
    assert got[4] == (8.0, 1)
