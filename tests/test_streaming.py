"""Structured Streaming parity: the streaming plan over a file source must
produce exactly the batch result on the same data (same transformation
function, different source) — plus watermark/state sanity."""

import pytest

from national_caseload_data_ingest_spark.session import load_tables
from national_caseload_data_ingest_spark.streaming.events import (
    sessionize,
    sessionize_events_stream,
    windowed_counts,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"
EVENTS_DIR = f"{SF}/events.parquet"


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_tables(spark, SF, "events")["events"]


def test_windowed_counts_stream_equals_batch(spark, events_batch):
    stream_result = _run_stream_to_memory(
        spark, windowed_counts_stream(spark, EVENTS_DIR), "win_counts"
    ).collect()
    batch_result = windowed_counts(events_batch, with_watermark=False).collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert sorted(
        [(r["window_start"], r["event_type"], r["n_events"], r["total_value"])
         for r in stream_result]
    ) == sorted(
        [(r["window_start"], r["event_type"], r["n_events"], r["total_value"])
         for r in batch_result]
    )
    assert len(batch_result) > 0


def test_sessionize_stream_equals_batch(spark, events_batch):
    stream_result = _run_stream_to_memory(
        spark, sessionize_events_stream(spark, EVENTS_DIR), "sessions"
    ).collect()
    batch_result = sessionize(events_batch, with_watermark=False).collect()
    assert sorted(
        [(r["user_id"], r["session_start"], r["n_events"]) for r in stream_result]
    ) == sorted(
        [(r["user_id"], r["session_start"], r["n_events"]) for r in batch_result]
    )
    assert len(batch_result) > 0


def test_streaming_plan_is_streaming(spark):
    sdf = windowed_counts_stream(spark, EVENTS_DIR)
    assert sdf.isStreaming


def test_user_lifetime_stats_stream_equals_batch(spark):
    from national_caseload_data_ingest_spark.streaming.events import (
        user_lifetime_stats,
        user_lifetime_stats_stream,
    )

    sdf = user_lifetime_stats_stream(spark, EVENTS_DIR)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a user's row each micro-batch it appears in;
    # n_events is monotone, so the final state is the max-n row per user.
    stream_rows = {}
    for r in spark.sql("SELECT * FROM user_stats").collect():
        prev = stream_rows.get(r["user_id"])
        if prev is None or r["n_events"] > prev["n_events"]:
            stream_rows[r["user_id"]] = r
    batch_rows = {
        r["user_id"]: r for r in user_lifetime_stats(spark, SF).collect()
    }
    assert set(stream_rows) == set(batch_rows) and len(batch_rows) > 0
    for uid, b in batch_rows.items():
        s = stream_rows[uid]
        assert (
            s["n_events"], s["n_types"], s["total_value"], s["max_gap_seconds"]
        ) == (
            b["n_events"], b["n_types"], b["total_value"], b["max_gap_seconds"]
        ), uid


def test_enrich_stream_equals_batch(spark, events_batch):
    """Stream-static join: streaming enrichment over the file source equals
    the batch join row-for-row."""
    from national_caseload_data_ingest_spark.streaming.events import (
        enrich_events,
        enrich_events_stream,
    )

    dim = load_tables(spark, SF, "customer")["customer"]
    sdf = enrich_events_stream(spark, EVENTS_DIR, dim)
    q = (
        sdf.writeStream.format("memory")
        .queryName("enriched_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM enriched_mem").collect()
    }
    want = {tuple(r) for r in enrich_events(events_batch, dim).collect()}
    assert got == want and len(want) > 0


def test_streaming_dedup_suppresses_redelivery(spark, events_batch, tmp_path):
    """dropDuplicatesWithinWatermark: a full redelivery of the event file in
    a later micro-batch yields no extra rows — output is exactly the
    distinct event set."""
    import shutil

    from national_caseload_data_ingest_spark.streaming.events import (
        dedup_events_stream,
    )

    d = tmp_path / "dup_events"
    d.mkdir()
    shutil.copy(EVENTS_DIR, d / "a.parquet")
    shutil.copy(EVENTS_DIR, d / "b.parquet")  # exact redelivery
    sdf = dedup_events_stream(spark, str(d))
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT event_id FROM dedup_mem").collect()
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids)), "duplicate event_ids in output"
    assert len(set(ids)) == events_batch.count()


def test_stream_stream_interval_join_equals_batch(spark, events_batch):
    """Stream-stream interval join (watermarked both sides) produces
    exactly the batch interval-join result on the same data."""
    from pyspark.sql import functions as F

    from national_caseload_data_ingest_spark.streaming.events import (
        correlate_signup_purchase,
        signup_purchase_stream,
    )

    sdf = signup_purchase_stream(spark, EVENTS_DIR)
    q = (
        sdf.writeStream.format("memory")
        .queryName("ssjoin_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssjoin_mem").collect()}
    want = {
        tuple(r)
        for r in correlate_signup_purchase(
            events_batch.filter(F.col("event_type") == "signup"),
            events_batch.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_lsh_candidates_equal_batch(spark, tmp_path):
    """The stateful streaming LSH candidate generator, fed the corpus one
    file per micro-batch, must emit exactly the batch self-join's pair set
    — arrival order and batch boundaries must not change the result."""
    from national_caseload_data_ingest_spark.streaming.documents import (
        lsh_candidates_batch,
        lsh_candidates_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs_stream")
    docs.repartition(6).write.parquet(docs_dir)

    sdf = lsh_candidates_stream(spark, docs_dir)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("lsh_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_pairs = {
        (r["band"], r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT * FROM lsh_cands").collect()
    }

    batch_pairs = {
        (r["band"], r["doc_a"], r["doc_b"])
        for r in lsh_candidates_batch(spark.read.parquet(docs_dir)).collect()
    }
    assert len(batch_pairs) > 0
    assert stream_pairs == batch_pairs


def test_streaming_lsh_recall_vs_exact_jaccard(spark):
    """Every exact-Jaccard pair over the batch-LSH threshold must appear
    among the streaming kernel's candidates (same banding guarantee as the
    xxhash batch path — pinned empirically for the fixed seeds)."""
    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.operators.dedup import (
        JACCARD_THRESHOLD,
    )

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ent.queries()["ngram_jaccard_pairs"](spark, SF).collect()
        if r["jaccard"] >= JACCARD_THRESHOLD
    }
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in ent.queries()["streaming_lsh_candidates"](spark, SF).collect()
    }
    assert len(exact) > 0
    missed = exact - cands
    assert not missed, f"streaming LSH kernel missed ground-truth pairs: {missed}"
