"""Exactly-once streaming sink into a transaction-log table.

``foreachBatch`` gives at-least-once batch delivery: after a crash the
last batch can be REDELIVERED with the same ``batch_id``.  The parquet
sink's answer is Spark's own commit log; the txlog sink's answer is the
table's commit metadata itself — every commit records its
``commitInfo.batchId``, and a redelivered batch whose id is already
committed is skipped, making the (batch_id → version) mapping
idempotent.  This is exactly how Delta's streaming sink achieves
exactly-once (txn/appId+version actions); the mechanism here is the
same, one level simpler.

Each micro-batch lands as ONE new table version (one data file + one
commit), so downstream consumers get: time travel to any micro-batch
boundary, a change feed per micro-batch (``txlog_changes(v, v+1)`` = the
batch), and snapshot isolation from concurrent readers — none of which
a bare parquet-append sink provides.

Scale: the commit is metadata; the data write is the batch's own
parallelism.  The idempotence check reads only commitInfo lines of the
log tail (kilobytes).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from national_caseload_data_ingest_spark.operators.txlog import (
    _commit_file,
    _log_dir,
    _write_data_file,
    txlog_commit,
    txlog_latest_version,
)


def committed_batch_ids(table_path: str) -> set[int]:
    """batch_ids recorded by prior commits (empty for a fresh table)."""
    if not os.path.isdir(_log_dir(table_path)):
        return set()
    out: set[int] = set()
    try:
        latest = txlog_latest_version(table_path)
    except ValueError:
        return out
    for v in range(latest + 1):
        path = _commit_file(table_path, v)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                info = action.get("commitInfo")
                if info and "batchId" in info:
                    out.add(int(info["batchId"]))
    return out


def write_stream_batch(
    batch_df: DataFrame, batch_id: int, table_path: str
) -> bool:
    """The foreachBatch body: append ``batch_df`` as one new version,
    SKIPPING redelivered batch_ids (exactly-once).  Returns True when a
    commit happened."""
    if int(batch_id) in committed_batch_ids(table_path):
        return False
    if batch_df.isEmpty():
        return False
    try:
        version = txlog_latest_version(table_path) + 1
    except (ValueError, FileNotFoundError):
        version = 0
    action = _write_data_file(batch_df, table_path, f"batch-{batch_id}")
    txlog_commit(table_path, version, [
        action,
        {"commitInfo": {"operation": "STREAMING UPDATE",
                        "batchId": int(batch_id)}},
    ])
    return True


def txlog_sink_stream(sdf: DataFrame, table_path: str,
                      checkpoint_dir: str):
    """Attach the txlog sink to a streaming DataFrame.  Returns the
    started query; callers ``awaitTermination`` it."""
    return (
        sdf.writeStream.foreachBatch(
            lambda df, bid: write_stream_batch(df, bid, table_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def quarantine_stream(
    sdf: DataFrame,
    rules: list[tuple],
    good_table: str,
    dlq_table: str,
    checkpoint_dir: str,
):
    """Row-level quarantine on a STREAM: each micro-batch splits into
    accepted rows (appended to ``good_table``) and rule-violating rows
    (appended to ``dlq_table`` WITH their ordered reason list — the
    dead-letter queue a replay job consumes), both as exactly-once
    txlog versions sharing the batch's id.  ``rules`` are (name,
    condition) pairs over the batch's columns, quarantine fires when
    ANY condition holds — the streaming twin of
    ``governance.quarantine_orders``.

    Crash safety: the two tables commit INDEPENDENTLY under the same
    batchId; a crash between the two writes redelivers the batch and
    the already-committed side skips (idempotent), so neither table
    ever double-counts a batch."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    def body(batch_df: DataFrame, batch_id: int) -> None:
        reasons = F.concat_ws(
            ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
        )
        tagged = batch_df.withColumn("__reasons", reasons)
        good = tagged.filter(F.col("__reasons") == "").drop("__reasons")
        bad = tagged.filter(F.col("__reasons") != "") \
            .withColumnRenamed("__reasons", "reasons")
        write_stream_batch(good, batch_id, good_table)
        write_stream_batch(bad, batch_id, dlq_table)

    return (
        sdf.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
