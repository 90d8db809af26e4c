"""Multi-clause MERGE (operators/merge.py): clause ordering, the
cardinality guard, all four clause classes, and insert defaults."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, val double",
    )


def test_all_four_clause_classes(spark):
    src = spark.createDataFrame(
        [(1, "D", 0.0), (2, "U", 99.0), (9, "I", 5.0), (8, "X", 1.0)],
        "k int, op string, p double",
    )
    out = merge_into(
        _target(spark), src, ["k"],
        matched=[
            ("delete", F.col("__s.op") == "D", None),
            ("update", F.col("__s.op") == "U",
             {"val": F.col("__s.p")}),
        ],
        not_matched=[
            ("insert", F.col("__s.op") == "I",
             {"k": F.col("__s.k"), "name": F.lit("new"),
              "val": F.col("__s.p")}),
        ],
        not_matched_by_source=[
            ("delete", F.col("__t.k") == 4, None),
        ],
    ).collect()
    got = sorted((r.k, r.name, r.val) for r in out)
    # 1 deleted; 2 updated; 3 kept (unmentioned, purge doesn't hit);
    # 4 purged; 9 inserted; 8 (op X, no matching insert clause) ignored
    assert got == [(2, "b", 99.0), (3, "c", 30.0), (9, "new", 5.0)]


def test_clause_order_first_match_wins(spark):
    src = spark.createDataFrame([(1, "B", 7.0)], "k int, op string, p double")
    # both clause conditions hold for row 1 — the FIRST must win
    out = merge_into(
        _target(spark), src, ["k"],
        matched=[
            ("update", None, {"val": F.lit(-1.0)}),
            ("delete", None, None),
        ],
    ).collect()
    vals = {r.k: r.val for r in out}
    assert vals[1] == -1.0 and len(vals) == 4  # updated, not deleted

    out2 = merge_into(
        _target(spark), src, ["k"],
        matched=[
            ("delete", None, None),
            ("update", None, {"val": F.lit(-1.0)}),
        ],
    ).collect()
    assert sorted(r.k for r in out2) == [2, 3, 4]  # deleted, not updated


def test_cardinality_violation_raises(spark):
    # r14: the guard rides IN the merge plan (a raise_error branch fed
    # by a per-key source count window), so the loud failure surfaces
    # when the merge executes — one source pass, no separate guard job
    src = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "k int, p double")
    with pytest.raises(Exception, match="cardinality"):
        merge_into(
            _target(spark), src, ["k"],
            matched=[("update", None, {"val": F.col("__s.p")})],
        ).collect()


def test_insert_defaults_same_named_columns_and_null(spark):
    # source carries k and val but no name: insert with assignments=None
    # takes same-named source columns, NULL elsewhere
    src = spark.createDataFrame([(7, 70.0)], "k int, val double")
    out = merge_into(
        _target(spark), src, ["k"],
        not_matched=[("insert", None, None)],
    ).collect()
    row = {r.k: (r.name, r.val) for r in out}[7]
    assert row == (None, 70.0)


def test_not_matched_by_source_update(spark):
    """The retention-purge class also supports UPDATE (e.g. flag stale
    rows instead of dropping them)."""
    src = spark.createDataFrame([(1, 0.0)], "k int, p double")
    out = merge_into(
        _target(spark), src, ["k"],
        not_matched_by_source=[
            ("update", F.col("__t.k") >= 3, {"name": F.lit("stale")}),
        ],
    ).collect()
    names = {r.k: r.name for r in out}
    assert names == {1: "a", 2: "b", 3: "stale", 4: "stale"}


def test_matched_fallthrough_keeps_row(spark):
    """A matched row whose clause conditions all fail is KEPT unchanged."""
    src = spark.createDataFrame([(1, "Z", 0.0)], "k int, op string, p double")
    out = merge_into(
        _target(spark), src, ["k"],
        matched=[("delete", F.col("__s.op") == "D", None)],
    ).collect()
    assert sorted(r.k for r in out) == [1, 2, 3, 4]
