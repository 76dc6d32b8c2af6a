"""Streaming sessionization — the live twin of ``operators.windows.
user_sessions`` (ST-family engine extension; the reference has no session
semantics, SURVEY.md §2.9 note).

``session_window`` is the same operator in batch and streaming; the
streaming form adds a watermark so state for a user's open session is
dropped once no event can extend it (gap + delay behind the watermark).
State is bounded per active user, never by history length — the property
that lets live sessionization run forever on a 100-TB/day event firehose.

Append output mode: a session row emits exactly once, when the watermark
passes its close — the contract a downstream sink (parquet/Delta append)
needs. ``tests/test_streaming.py`` pins that emitted sessions are
byte-identical to the batch operator's rows and that every session the
watermark has passed is emitted.

Lateness bound: the watermark trails the max observed event time by
``WATERMARK_DELAY`` — an event arriving in a later micro-batch is still
incorporated into its session as long as it is less than that much behind
the stream's frontier; anything older is dropped by design (that is the
state-eviction contract that keeps per-user state bounded). With a
``0 seconds`` delay any cross-batch reordering is droppable, so the
default is one hour; ``tests/test_streaming.py::
test_sessionization_multibatch_out_of_order`` forces one-file-per-trigger
micro-batches to pin both sides of the bound (in-bound late event merges,
out-of-bound event is discarded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import SESSION_GAP_HOURS

WATERMARK_DELAY = "1 hour"


def user_sessions_stream(
    events: DataFrame, delay: str = WATERMARK_DELAY
) -> DataFrame:
    """Watermarked session aggregation over a streaming events frame with
    the exact schema/semantics of the batch ``user_sessions``."""
    sw = F.session_window(F.col("ts"), f"{SESSION_GAP_HOURS} hours")
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.col("user_id"), sw.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_errors",
        )
    )
