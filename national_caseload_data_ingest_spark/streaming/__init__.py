"""Structured Streaming surface over the ``events`` stream table.

The reference is batch-only (Athena; monthly cumulative dumps —
``/root/reference/README.md:15-22``), so streaming is a pure extension:
the same event-time operators exposed batch-side in ``operators.analytic``
(tumbling/sliding windows) are runnable as streams here, plus
session-window aggregation and a custom stateful operator.
"""

from national_caseload_data_ingest_spark.streaming.events import (
    sessionize_events_stream,
    windowed_counts_stream,
)

__all__ = ["windowed_counts_stream", "sessionize_events_stream"]
