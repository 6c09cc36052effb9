"""Custom stateful streaming operator: per-conversation progress.

The reference is stateless (at-least-once apply, no event-time);
the Spark engine adds the stateful layer a transcript pipeline wants:
a continuously-updated per-conversation summary (turns seen, max turn
index, last activity, deletes seen) maintained with
``applyInPandasWithState`` — Arrow-batched state updates, no per-row
Python, processing-time timeout to close idle conversations.

Usage (streaming)::

    events = file_stream(spark, drop_dir, CDC_EVENT_SCHEMA_V3)
    progress = conversation_progress(events, idle_timeout_min=30)
    progress.writeStream.outputMode("update")...

Emits one row per conversation per trigger in which it changed, plus
a final ``closed=true`` row when the idle timeout fires.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("last_offset", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("last_offset", T.LongType()),
    ]
)

_OUT_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


def conversation_progress(
    events: DataFrame, idle_timeout_min: int = 30
) -> DataFrame:
    """Stateful per-conversation rollup over a streaming event frame."""
    timeout_ms = idle_timeout_min * 60 * 1000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_events, max_turn, n_del, last_off = state.get
            state.remove()
            yield pd.DataFrame(
                [[conv_id, n_events, max_turn, n_del, last_off, True]],
                columns=_OUT_COLS,
            )
            return

        n_events, max_turn, n_del, last_off = (
            state.get if state.exists else (0, -1, 0, -1)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_events += len(pdf)
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            n_del += int((pdf["op"] == "d").sum())
            last_off = max(last_off, int(pdf["kafka_offset"].max()))
        state.update((n_events, max_turn, n_del, last_off))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [[conv_id, n_events, max_turn, n_del, last_off, False]],
            columns=_OUT_COLS,
        )

    return events.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
