"""Hand-computed cases for triangle counting (`operators/graph.py`),
event-sequence trigrams and the SCD2 point-in-time join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _tri_counts(spark, edges):
    """Run the triangle kernel on an explicit edge list via the same
    canonical-orientation joins the query uses."""
    pairs = spark.createDataFrame(edges, "a long, b long")
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    nodes = (
        tri.select(F.col("x").alias("n"))
        .unionAll(tri.select(F.col("y").alias("n")))
        .unionAll(tri.select(F.col("z").alias("n")))
    )
    return {
        r["n"]: r["c"]
        for r in nodes.groupBy("n").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_triangle_enumeration_canonical(spark):
    # K4 on {1,2,3,4} minus edge (1,4): triangles (1,2,3) and (2,3,4)
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    got = _tri_counts(spark, edges)
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_free_graph_yields_nothing(spark):
    got = _tri_counts(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])  # 4-cycle
    assert got == {}


def _ev(spark, rows):
    import os
    import tempfile

    df = spark.createDataFrame(
        [
            (i, u, t, datetime(2024, 1, 1, h), 1.0, "{}")
            for i, (u, t, h) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double, props string",
    )
    td = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
    return td


def test_common_event_trigrams(spark):
    from national_caseload_data_ingest_spark.operators.behavior import (
        common_event_trigrams,
    )

    td = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2), (1, "view", 3),
            (2, "view", 0), (2, "click", 1), (2, "purchase", 2),
        ],
    )
    got = {r["trigram"]: r["n"] for r in common_event_trigrams(spark, td).collect()}
    assert got == {
        "view>click>purchase": 2,
        "click>purchase>view": 1,
    }


def test_scd2_point_in_time_join(spark):
    from national_caseload_data_ingest_spark.operators.timeseries import (
        scd2_point_in_time_join,
    )

    # user 1: view@0 → state 'view' until purchase@2 flips state; the
    # purchase AT the boundary instant belongs to the NEW interval
    # (ts >= valid_from), matching half-open [from, to) semantics.
    td = _ev(
        spark,
        [(1, "view", 0), (1, "purchase", 2), (1, "view", 3), (1, "purchase", 5)],
    )
    rows = sorted(
        scd2_point_in_time_join(spark, td).collect(), key=lambda r: r["ts"]
    )
    assert [(r["state_at_event"], r["ts"].hour) for r in rows] == [
        ("purchase", 2),
        ("purchase", 5),
    ]
    assert rows[0]["state_since"].hour == 2
    assert rows[1]["state_since"].hour == 5
    # every purchase matched exactly one interval
    assert len(rows) == 2
