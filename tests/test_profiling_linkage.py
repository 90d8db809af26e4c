"""Tests for the table profiler (`operators/profiling.py`) and blocked
record linkage (`operators/linkage.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.linkage import link_records
from national_caseload_data_ingest_spark.operators.profiling import (
    profile_table,
)


def test_profile_table_values(spark):
    df = spark.createDataFrame(
        [
            (1, 2.5, "a"),
            (2, None, "b"),
            (2, 7.5, None),
            (None, 1.0, "a"),
        ],
        "k long, v double, s string",
    )
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(got) == {"k", "v", "s"}
    for r in got.values():
        assert r["n_rows"] == 4
    assert got["k"]["n_nulls"] == 1
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 2.0
    assert got["k"]["min_str"] is None
    assert got["v"]["n_nulls"] == 1
    assert got["v"]["min_num"] == 1.0 and got["v"]["max_num"] == 7.5
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["s"]["min_num"] is None


def test_profile_is_single_scan(spark):
    """All columns must profile in ONE pass: a single scan of the source
    in the physical plan, no per-column jobs."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"),
        F.col("id").cast("string").alias("s"),
    )
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_linkage_matches_reference(spark):
    recs = spark.createDataFrame(
        [
            (1, "smith", "X"),
            (2, "smyth", "X"),   # dist 1 → link
            (3, "smithe", "X"),  # dist 1 to smith, 2 to smyth → links
            (4, "jones", "X"),   # far from all
            (5, "smith", "Y"),   # same name, different block → no link
        ],
        "id long, name string, blk string",
    )
    got = {
        (r["key_a"], r["key_b"]): r["dist"]
        for r in link_records(
            recs, "id", "name", ["blk"], max_dist=2
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_linkage_block_guard_trips(spark):
    recs = spark.createDataFrame(
        [(i, f"n{i}", "B") for i in range(10)], "id long, name string, blk string"
    )
    df = link_records(recs, "id", "name", ["blk"], max_dist=2, max_block=5)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "linkage block holds" in str(ei.value)


def test_linkage_blocks_via_equi_join(spark):
    """The candidate generator must be an equi join on the blocking key —
    never a cartesian product."""
    recs = spark.createDataFrame(
        [(i, f"n{i}", f"b{i % 3}") for i in range(30)],
        "id long, name string, blk string",
    )
    plan = (
        link_records(recs, "id", "name", ["blk"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
