"""Transaction-log tables (operators/txlog.py): commit replay, time
travel, checkpoint compaction, and the corruption guards."""

from __future__ import annotations

import json
import os

import pytest

from national_caseload_data_ingest_spark.operators.txlog import (
    txlog_checkpoint,
    txlog_commit,
    txlog_latest_version,
    txlog_live_files,
    txlog_snapshot,
)


def _table(tmp_path, spark):
    """A 3-commit table over tiny parquet files: v0 adds f0(1,2) and
    f1(3,4); v1 adds f2(5,6); v2 removes f1 and adds f3(7)."""
    base = str(tmp_path / "t")
    for name, vals in [("f0", [1, 2]), ("f1", [3, 4]), ("f2", [5, 6]),
                       ("f3", [7])]:
        spark.createDataFrame([(v,) for v in vals], "v int") \
            .coalesce(1).write.parquet(os.path.join(base, name))
    txlog_commit(base, 0, [
        {"add": {"path": "f0", "numRecords": 2}},
        {"add": {"path": "f1", "numRecords": 2}},
        {"commitInfo": {"operation": "WRITE"}},
    ])
    txlog_commit(base, 1, [{"add": {"path": "f2", "numRecords": 2}}])
    txlog_commit(base, 2, [
        {"remove": {"path": "f1"}},
        {"add": {"path": "f3", "numRecords": 1}},
    ])
    return base


def _vals(df):
    return sorted(r.v for r in df.collect())


def test_snapshot_per_version(spark, tmp_path):
    base = _table(tmp_path, spark)
    assert txlog_latest_version(base) == 2
    assert _vals(txlog_snapshot(spark, base, 0)) == [1, 2, 3, 4]
    assert _vals(txlog_snapshot(spark, base, 1)) == [1, 2, 3, 4, 5, 6]
    assert _vals(txlog_snapshot(spark, base, 2)) == [1, 2, 5, 6, 7]
    # default = latest
    assert _vals(txlog_snapshot(spark, base)) == [1, 2, 5, 6, 7]


def test_checkpoint_equivalence_and_bounded_replay(spark, tmp_path):
    base = _table(tmp_path, spark)
    before = {v: txlog_live_files(base, v) for v in range(3)}
    assert txlog_checkpoint(base, 1) == 1
    # every version's live-set is unchanged by the checkpoint —
    # including v0, which must replay from scratch (checkpoint > v0)
    for v in range(3):
        assert txlog_live_files(base, v) == before[v]
    # and the checkpoint is actually USED: delete commits 0-1; versions
    # >= the checkpoint still resolve, earlier ones now fail
    os.remove(os.path.join(base, "_log", f"{0:020d}.json"))
    assert [a["path"] for a in txlog_live_files(base, 1)] == [
        "f0", "f1", "f2"]
    assert [a["path"] for a in txlog_live_files(base, 2)] == [
        "f0", "f2", "f3"]
    with pytest.raises(FileNotFoundError):
        txlog_live_files(base, 0)


def test_checkpoint_refuses_to_move_backwards(spark, tmp_path):
    """An explicit older version must not regress _last_checkpoint:
    later snapshots would replay longer tails and vacuum's retention
    math would key off a stale pointer (ADVICE r11)."""
    base = _table(tmp_path, spark)
    assert txlog_checkpoint(base, 2) == 2
    with pytest.raises(ValueError, match="behind"):
        txlog_checkpoint(base, 1)
    # pointer unchanged, newest-version replay unaffected
    assert [a["path"] for a in txlog_live_files(base, 2)] == [
        "f0", "f2", "f3"]
    # re-checkpointing the SAME version is a harmless no-op rewrite
    assert txlog_checkpoint(base, 2) == 2


def test_version_out_of_range(spark, tmp_path):
    base = _table(tmp_path, spark)
    with pytest.raises(ValueError, match="out of range"):
        txlog_live_files(base, 3)
    with pytest.raises(ValueError, match="out of range"):
        txlog_live_files(base, -1)


def test_corruption_guards(spark, tmp_path):
    base = _table(tmp_path, spark)
    with pytest.raises(ValueError, match="without commit"):
        txlog_commit(base, 5, [])
    txlog_commit(base, 3, [{"remove": {"path": "f1"}}])
    with pytest.raises(ValueError, match="removes absent file"):
        txlog_live_files(base, 3)
    # rewrite commit 3 in place for each remaining guard (overwrite
    # bypasses the O_EXCL conflict check — fixtures only)
    txlog_commit(base, 3, [{"add": {"path": "f0", "numRecords": 2}}],
                 overwrite=True)
    with pytest.raises(ValueError, match="re-adds live file"):
        txlog_live_files(base, 3)
    with open(os.path.join(base, "_log", f"{3:020d}.json"), "w") as f:
        f.write("{not json\n")
    with pytest.raises(ValueError, match="corrupt action"):
        txlog_live_files(base, 3)
    with open(os.path.join(base, "_log", f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"mystery": 1}) + "\n")
    with pytest.raises(ValueError, match="unknown action"):
        txlog_live_files(base, 3)


def test_immutable_history_under_rewrite(spark, tmp_path):
    """Time travel returns the OLD rows even after the file carrying
    them was tombstoned — the bytes are immutable, only the live-set
    changes.  (This is the capability the reference's MSCK catalog
    lacks: reproducing yesterday's corpus exactly.)"""
    base = _table(tmp_path, spark)
    assert 3 in _vals(txlog_snapshot(spark, base, 1))
    assert 3 not in _vals(txlog_snapshot(spark, base, 2))
    assert 3 in _vals(txlog_snapshot(spark, base, 1))  # still


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_compact,
        txlog_snapshot,
        txlog_vacuum,
    )

    base = _table(tmp_path, spark)  # live at v2: f0(1,2), f2(5,6), f3(7)
    before = _vals(txlog_snapshot(spark, base))
    n_before = len(txlog_live_files(base, 2))
    v = txlog_compact(spark, base, target_records=10)
    assert v == 3
    assert _vals(txlog_snapshot(spark, base)) == before
    after = txlog_live_files(base, v)
    assert len(after) < n_before
    # the compaction is one file here (total 5 rows < target 10)
    assert [a["path"] for a in after] == ["compact-0"]
    assert sum(a["numRecords"] for a in after) == len(before)
    # time travel to v2 still sees the ORIGINAL files
    assert _vals(txlog_snapshot(spark, base, 2)) == before
    # vacuum with the full log retained deletes nothing (every version
    # is still reachable)
    assert txlog_vacuum(base) == []


def test_compact_respects_target_and_skips_big_files(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_compact,
    )

    base = str(tmp_path / "t2")
    names = []
    for i in range(6):
        name = f"s{i}"
        names.append(name)
        spark.createDataFrame([(i * 10 + j,) for j in range(2)], "v int") \
            .coalesce(1).write.parquet(os.path.join(base, name))
    spark.createDataFrame([(x,) for x in range(100, 120)], "v int") \
        .coalesce(1).write.parquet(os.path.join(base, "big"))
    txlog_commit(base, 0, [
        *({"add": {"path": n, "numRecords": 2}} for n in names),
        {"add": {"path": "big", "numRecords": 20}},
    ])
    v = txlog_compact(spark, base, target_records=5)
    assert v == 1
    after = txlog_live_files(base, v)
    paths = [a["path"] for a in after]
    # big file untouched; 6 two-row files packed into bins of <=5 rows
    assert "big" in paths
    compacted = [a for a in after if a["path"].startswith("compact-")]
    assert all(a["numRecords"] <= 5 for a in compacted)
    assert sum(a["numRecords"] for a in compacted) == 12
    assert len(compacted) == 3  # next-fit: 2+2, 2+2, 2+2


def test_vacuum_after_log_truncation(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_checkpoint,
        txlog_snapshot,
        txlog_vacuum,
    )

    base = _table(tmp_path, spark)
    txlog_checkpoint(base, 2)
    # simulate retention: drop pre-checkpoint commits
    for v in range(3):
        os.remove(os.path.join(base, "_log", f"{v:020d}.json"))
    # f1 was tombstoned at v2 and no reachable version references it
    deleted = txlog_vacuum(base)
    assert deleted == ["f1"]
    assert not os.path.exists(os.path.join(base, "f1"))
    # the latest snapshot is intact
    assert _vals(txlog_snapshot(spark, base)) == [1, 2, 5, 6, 7]


def test_change_feed_between_versions(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_changes,
    )

    base = _table(tmp_path, spark)
    # v1 -> v2: f1(3,4) removed, f3(7) added
    feed = txlog_changes(spark, base, 1, 2).collect()
    got = sorted((r.v, r._change_type) for r in feed)
    assert got == [(3, "delete"), (4, "delete"), (7, "insert")]
    # v0 -> v1: pure append
    feed = txlog_changes(spark, base, 0, 1).collect()
    assert sorted((r.v, r._change_type) for r in feed) == [
        (5, "insert"), (6, "insert")]
    with pytest.raises(ValueError, match="no changes"):
        txlog_changes(spark, base, 1, 1)


def test_data_skipping_prunes_and_preserves(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_scan,
        write_data_file_with_stats,
    )

    base = str(tmp_path / "skip")
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    actions = []
    for i in range(4):
        part = df.filter((df.v >= i * 25) & (df.v < (i + 1) * 25))
        actions.append(
            write_data_file_with_stats(part, base, f"r{i}", ["v"]))
    txlog_commit(base, 0, actions)
    out, read, total = txlog_scan(spark, base,
                                  min_max_filter=("v", 30, 40))
    assert (read, total) == (1, 4)
    assert sorted(r.v for r in out.collect()) == list(range(30, 41))
    # a filter straddling two files reads exactly two
    out, read, total = txlog_scan(spark, base,
                                  min_max_filter=("v", 20, 30))
    assert (read, total) == (2, 4)
    assert sorted(r.v for r in out.collect()) == list(range(20, 31))
    # no filter: all files, all rows
    out, read, total = txlog_scan(spark, base)
    assert (read, total) == (4, 4)
    # fully pruned scan raises rather than returning a wrong empty frame
    # (all files still carry stats here, so pruning CAN be total)
    with pytest.raises(ValueError, match="every file pruned"):
        txlog_scan(spark, base, min_max_filter=("v", 1000, 2000))
    # a file with NO stats is conservatively read — including when the
    # range would otherwise prune everything
    actions2 = list(actions)
    del actions2[0]["add"]["stats"]
    import shutil
    shutil.rmtree(os.path.join(base, "_log"))
    txlog_commit(base, 0, actions2)
    out, read, total = txlog_scan(spark, base,
                                  min_max_filter=("v", 30, 40))
    assert (read, total) == (2, 4)  # stats-less r0 + matching r1
    assert sorted(r.v for r in out.collect()) == list(range(30, 41))
    out, read, total = txlog_scan(spark, base,
                                  min_max_filter=("v", 1000, 2000))
    assert (read, total) == (1, 4)  # only the stats-less file
    assert out.count() == 0


def test_bloom_point_scan_prunes_exactly(spark, tmp_path):
    """Bloom skipping on a MOD-bucketed column (min/max cannot prune a
    point probe here: every file's range covers the whole domain).  The
    expected file set is recomputed in pure Python with the same probe
    formula, so the assertion is exact, false positives included."""
    from national_caseload_data_ingest_spark.operators.txlog import (
        _bloom_probe_py,
        txlog_point_scan,
        write_data_file_with_bloom,
    )

    base = str(tmp_path / "bloom")
    vals = {i: [v for v in range(200) if v % 4 == i] for i in range(4)}
    actions = []
    for i in range(4):
        part = spark.createDataFrame([(v,) for v in vals[i]], "v int")
        actions.append(
            write_data_file_with_bloom(part, base, f"m{i}", "v"))
    txlog_commit(base, 0, actions)

    def expected_files(value):
        out = []
        for i, a in enumerate(actions):
            meta = a["add"]["bloom"]["v"]
            hit = all(
                (meta["words"][
                    (p := _bloom_probe_py(value, j, meta["m"])) // 64]
                 >> (p % 64)) & 1
                for j in range(meta["k"])
            )
            if hit:
                out.append(i)
        return out

    for probe in [0, 1, 2, 3, 17, 42, 199]:
        df, read, total = txlog_point_scan(spark, base, "v", probe)
        assert total == 4
        assert read == len(expected_files(probe))
        # no false negatives ever: the true holder is always read
        assert probe % 4 in expected_files(probe)
        assert [r.v for r in df.collect()] == [probe]
    # a value outside the domain: typically zero files; rows empty
    df, read, total = txlog_point_scan(spark, base, "v", 10**9)
    assert read == len(expected_files(10**9))
    assert df.count() == 0
    # at 1 KiB bitmaps over 50 keys the FPR is ~0: most probes read 1
    reads = [txlog_point_scan(spark, base, "v", p)[1]
             for p in [5, 23, 77, 131]]
    assert sum(reads) <= 6


def test_streaming_txlog_sink_exactly_once(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_changes,
        txlog_latest_version,
        txlog_snapshot,
    )
    from national_caseload_data_ingest_spark.streaming.txlog_sink import (
        committed_batch_ids,
        txlog_sink_stream,
        write_stream_batch,
    )

    src = str(tmp_path / "src")
    batch = spark.createDataFrame(
        [(i, f"u{i % 7}") for i in range(60)], "event_id int, user string"
    )
    batch.repartition(6).write.parquet(src)
    table = str(tmp_path / "sink")
    sdf = spark.readStream.schema(batch.schema) \
        .option("maxFilesPerTrigger", 2).parquet(src)
    q = txlog_sink_stream(sdf, table, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # stream == batch
    got = sorted(r.event_id for r in txlog_snapshot(spark, table).collect())
    assert got == list(range(60))
    latest = txlog_latest_version(table)
    assert latest >= 1  # genuinely multi-batch (6 files / 2 per trigger)
    assert committed_batch_ids(table) == set(range(latest + 1))

    # the change feed of one version IS that micro-batch
    feed = txlog_changes(spark, table, latest - 1, latest)
    assert feed.filter("_change_type = 'delete'").count() == 0
    n_last = feed.count()
    assert 0 < n_last < 60

    # redelivery of an already-committed batch_id is a no-op
    extra = spark.createDataFrame([(999, "x")], "event_id int, user string")
    assert write_stream_batch(extra, 0, table) is False
    assert txlog_latest_version(table) == latest
    assert txlog_snapshot(spark, table).count() == 60
    # a NEW batch_id commits
    assert write_stream_batch(extra, latest + 100, table) is True
    assert txlog_snapshot(spark, table).count() == 61


def test_concurrent_commit_conflict(spark, tmp_path):
    """Optimistic concurrency: the second writer of the same version
    loses with FileExistsError (and the winner's commit is intact)."""
    base = _table(tmp_path, spark)
    txlog_commit(base, 3, [{"remove": {"path": "f3"}}])
    with pytest.raises(FileExistsError, match="concurrent commit"):
        txlog_commit(base, 3, [{"remove": {"path": "f0"}}])
    assert [a["path"] for a in txlog_live_files(base, 3)] == ["f0", "f2"]


def test_delete_where_rewrites_only_matching_files(spark, tmp_path):
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_delete_where,
        txlog_snapshot,
        write_data_file_with_bloom,
    )

    base = str(tmp_path / "gdpr")
    actions = []
    for i in range(4):
        part = spark.createDataFrame(
            [(v,) for v in range(200) if v % 4 == i], "v int")
        actions.append(
            write_data_file_with_bloom(part, base, f"m{i}", "v"))
    txlog_commit(base, 0, actions)

    # delete two values living in files m1 (v=5) and m2 (v=6)
    v = txlog_delete_where(spark, base, "v", [5, 6])
    assert v == 1
    live = {a["path"] for a in txlog_live_files(base)}
    # m0 and m3 untouched; m1/m2 tombstoned and rewritten
    assert "m0" in live and "m3" in live
    assert "m1" not in live and "m2" not in live
    assert any(p.startswith("m1-del") for p in live)
    got = sorted(r.v for r in txlog_snapshot(spark, base).collect())
    assert got == [x for x in range(200) if x not in (5, 6)]
    # time travel to v0 still shows the deleted rows (retention/vacuum
    # is the forget-history step, deliberately separate)
    assert 5 in {r.v for r in txlog_snapshot(spark, base, 0).collect()}
    # the rewritten files carry REFRESHED blooms: a new point scan for
    # the deleted key reads fewer rows and returns none
    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_point_scan,
    )

    df, read, total = txlog_point_scan(spark, base, "v", 5)
    assert df.count() == 0
    # deleting values no file can contain is a no-op version-wise
    assert txlog_delete_where(spark, base, "v", [10**9]) == 1


def test_streaming_quarantine_splits_and_is_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from national_caseload_data_ingest_spark.operators.txlog import (
        txlog_snapshot,
    )
    from national_caseload_data_ingest_spark.streaming.txlog_sink import (
        quarantine_stream,
        write_stream_batch,
    )

    src = str(tmp_path / "qsrc")
    batch = spark.createDataFrame(
        [(i, float(i % 9) - 1.0) for i in range(40)],
        "event_id int, value double",
    )
    batch.repartition(4).write.parquet(src)
    good_t = str(tmp_path / "good")
    dlq_t = str(tmp_path / "dlq")
    rules = [
        ("negative_value", F.col("value") < 0),
        ("synthetic", F.col("event_id") % 10 == 7),
    ]
    sdf = spark.readStream.schema(batch.schema) \
        .option("maxFilesPerTrigger", 2).parquet(src)
    q = quarantine_stream(sdf, rules, good_t, dlq_t,
                          str(tmp_path / "qckpt"))
    q.awaitTermination(120)

    good = txlog_snapshot(spark, good_t)
    dlq = txlog_snapshot(spark, dlq_t)
    # stream == batch split
    want_bad = {i for i in range(40) if i % 9 == 0 or i % 10 == 7}
    assert {r.event_id for r in dlq.collect()} == want_bad
    assert {r.event_id for r in good.collect()} \
        == set(range(40)) - want_bad
    # reasons carried; multi-rule rows comma-join in rule order
    reasons = {r.event_id: r.reasons for r in dlq.collect()}
    assert reasons[27] == "negative_value,synthetic"  # 27%9==0, 27%10==7
    assert reasons[9] == "negative_value"
    assert reasons[17] == "synthetic"
    # redelivery of batch 0 to either side is a no-op
    extra = spark.createDataFrame([(999, -5.0)],
                                  "event_id int, value double")
    assert write_stream_batch(extra, 0, good_t) is False
    assert write_stream_batch(extra, 0, dlq_t) is False
    assert good.count() + dlq.count() == 40
