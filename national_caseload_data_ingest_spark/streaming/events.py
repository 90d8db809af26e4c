"""Event-stream operators: windowed aggregation and sessionization, in both
streaming (``readStream``) and batch form.

Design: batch and streaming share the *same* transformation functions — a
DataFrame-in/DataFrame-out operator doesn't know whether its source is
``spark.read`` or ``spark.readStream`` (the Structured Streaming model).
Tests run the streaming path with a file source + memory sink and assert it
equals the batch result on the same data; the batch form of
``session_window`` is also oracle-checked (gaps-and-islands SQL).

Scale notes: watermarks bound state (late events beyond 10 minutes are
dropped); session state is per (user_id, session) and evicts on watermark
passage — the state store grows with *active* sessions, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from national_caseload_data_ingest_spark.functions import dec
from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

# ``ts`` is TIMESTAMP(NANOS) in the parquet files; with
# spark.sql.legacy.parquet.nanosAsLong it surfaces as int64 nanoseconds and
# is converted to a µs timestamp below (same convention as
# session.load_tables).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-stream source over a directory; a single-file path (the test
    layout's ``events.parquet``) is handled via its parent + a glob filter,
    since FileStreamSource requires a directory."""
    import os  # noqa: PLC0415

    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 4)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.parquet(events_path)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

SESSION_GAP = "30 minutes"
WATERMARK = "10 minutes"


def windowed_counts(events: DataFrame, with_watermark: bool) -> DataFrame:
    """5-minute tumbling counts per event_type — batch and streaming."""
    e = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame, with_watermark: bool) -> DataFrame:
    """Gap-based sessions per user via ``F.session_window`` (30-min gap)."""
    e = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        e.groupBy(F.session_window("ts", SESSION_GAP).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            "n_events",
        )
    )


def windowed_counts_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming form: parquet file source → watermarked windowed agg.

    Returns an unstarted streaming DataFrame; callers attach a sink
    (``writeStream``).  The transformation is byte-identical to the batch
    plan — only the source differs.
    """
    return windowed_counts(_events_stream(spark, events_dir), with_watermark=True)


def sessionize_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    return sessionize(_events_stream(spark, events_dir), with_watermark=True)


@query(
    "session_window_events",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('microsecond', LAG(ts) OVER w, ts)
                            >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch session windows (30-min gap) — oracle is the classic
    gaps-and-islands rewrite, proving ``F.session_window`` semantics.

    The >= 1800 s new-session rule matches Spark's merge semantics:
    session windows are closed-open ``[t, t+gap)``, so an event exactly
    ``gap`` after its predecessor starts a new session."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return sessionize(e, with_watermark=False)
