"""Event-time windowed aggregation with watermark (SURVEY §2b
streaming category): append-mode emits exactly the closed windows,
whose values match the batch computation of the same expression."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.datagen import GenSpec, generate_cdc_events
from kafka_jdbc_sink_connector_spark.schemas import CDC_EVENT_SCHEMA_V3
from kafka_jdbc_sink_connector_spark.sources.cdc import file_stream
from kafka_jdbc_sink_connector_spark.streaming.windows import (
    windowed_event_counts,
)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    spec = GenSpec(n_events=8000, n_conversations=50,
                   turns_per_conversation=8)
    # datagen ts = BASE_EPOCH + offset seconds → ~2.2 hours of data
    events = generate_cdc_events(spark, spec).cache()
    try:
        # time-ordered files so the watermark advances monotonically
        for lo, hi in [(0, 2000), (2000, 4000), (4000, 6000),
                       (6000, 8000)]:
            (
                events.filter(
                    (F.col("kafka_offset") >= lo)
                    & (F.col("kafka_offset") < hi)
                )
                .coalesce(1).write.mode("append").parquet(src)
            )
        stream = file_stream(
            spark, src, CDC_EVENT_SCHEMA_V3, max_files_per_trigger=1
        )
        agg = windowed_event_counts(
            stream, window_duration="30 minutes",
            watermark_delay="10 minutes", group_cols=("op",),
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory").queryName("win_counts")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["window_start"], r["window_end"], r["op"]): r["n_events"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got, "no windows were finalized by the watermark"

        want = {
            (r["window_start"], r["window_end"], r["op"]): r["n_events"]
            for r in windowed_event_counts(
                events, window_duration="30 minutes",
                watermark_delay="10 minutes", group_cols=("op",),
            ).collect()
        }
        # every emitted (closed) window matches the batch computation
        for k, v in got.items():
            assert want[k] == v, k
        # only windows the final watermark closed were emitted
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        wm = max_ts - dt.timedelta(minutes=10)
        for (ws, we, _op) in got:
            assert we <= wm
        # and all clearly-closed windows (end before the watermark at
        # the LAST batch boundary) did emit
        closed = {k for k in want if k[1] <= wm}
        assert set(got) == closed
    finally:
        events.unpersist()
        spark.catalog.dropTempView("win_counts")


def test_sliding_window_batch(spark):
    """Sliding windows (overlap) — batch check of the same helper."""
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 5)),
        ("a", dt.datetime(2024, 1, 1, 0, 20)),
        ("b", dt.datetime(2024, 1, 1, 0, 35)),
    ]
    df = spark.createDataFrame(rows, "op string, ts timestamp")
    out = windowed_event_counts(
        df, window_duration="30 minutes", slide_duration="15 minutes",
        group_cols=("op",),
    ).collect()
    # each event lands in 2 overlapping 30m/15m windows
    assert sum(r["n_events"] for r in out) == 6
