"""upsert_latest (CDC merge) semantics: latest version wins, ties go to
the changes side, unmatched keys pass through, new keys insert."""

from national_caseload_data_ingest_spark.operators.temporal import upsert_latest


def test_upsert_latest_merge_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 5)],
        "k bigint, payload string, version bigint",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 2),  # newer version replaces
            (3, "c2", 5),  # same version: changes side wins the tie
            (4, "d", 1),   # brand-new key inserts
        ],
        "k bigint, payload string, version bigint",
    )
    got = {
        r["k"]: (r["payload"], r["version"])
        for r in upsert_latest(base, changes, ["k"], "version").collect()
    }
    assert got == {
        1: ("a2", 2),
        2: ("b", 1),   # untouched key survives
        3: ("c2", 5),
        4: ("d", 1),
    }


def test_upsert_latest_stale_change_ignored(spark):
    base = spark.createDataFrame([(1, "new", 9)], "k bigint, payload string, version bigint")
    changes = spark.createDataFrame([(1, "old", 3)], "k bigint, payload string, version bigint")
    got = upsert_latest(base, changes, ["k"], "version").collect()
    assert [(r["k"], r["payload"], r["version"]) for r in got] == [(1, "new", 9)]
