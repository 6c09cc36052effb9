"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no event-time semantics (ordering is by Kafka offset
only, SURVEY.md §2b); a transcript-analytics consumer of the ingested
stream needs them, so the engine ships the canonical Structured
Streaming form: ``withWatermark`` + ``window()`` grouping. State is
managed by Spark's streaming aggregation operator; the watermark both
bounds the state store and decides when a window is final (append
mode emits exactly one row per closed window — late events beyond the
watermark are dropped, the documented trade).

Everything is JVM-side expressions — no Python in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts per group.

    Output: window_start, window_end, *group_cols, n_events,
    n_distinct_users? — kept to count + a sum so the same expression
    tree works for both the streaming (stateful) and batch (plain
    groupBy) plans; tests assert the two agree on closed windows.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(c) for c in group_cols],
            "n_events",
        )
    )
