"""applyInPandasWithState conversation-progress operator: state
persists across micro-batches; counts match a batch groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.datagen import GenSpec, generate_cdc_events
from kafka_jdbc_sink_connector_spark.schemas import CDC_EVENT_SCHEMA_V3
from kafka_jdbc_sink_connector_spark.sources.cdc import file_stream
from kafka_jdbc_sink_connector_spark.streaming.stateful import (
    conversation_progress,
)


def test_conversation_progress_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    events = generate_cdc_events(
        spark,
        GenSpec(n_events=1200, n_conversations=20,
                turns_per_conversation=6, delete_fraction=0.05),
    ).cache()
    try:
        for lo, hi in [(0, 600), (600, 1200)]:
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
        progress = conversation_progress(stream, idle_timeout_min=0)
        q = (
            progress.writeStream.outputMode("update")
            .format("memory").queryName("conv_progress")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        # ProcessingTimeTimeout keeps firing empty batches, so
        # processAllAvailable()/availableNow never settle — poll until
        # all 1200 events went through, then stop. recentProgress (the
        # complete retained list), not lastProgress: two micro-batches
        # completing within one poll interval must both be counted.
        import time

        seen = 0
        deadline = time.monotonic() + 180
        rows_by_batch: dict[int, int] = {}
        while time.monotonic() < deadline and seen < 1200:
            time.sleep(2)
            for p in q.recentProgress:
                rows_by_batch[p["batchId"]] = p["numInputRows"]
            seen = sum(rows_by_batch.values())
        q.stop()
        assert seen == 1200, f"only {seen} events processed"

        # the LAST update row per conversation carries the final state
        out = spark.sql(
            "SELECT * FROM conv_progress"
        ).collect()
        latest = {}
        for r in out:
            cur = latest.get(r["conv_id"])
            if cur is None or r["n_events"] > cur["n_events"]:
                latest[r["conv_id"]] = r

        want = {
            r["conv_id"]: r
            for r in events.groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.max("turn_idx").alias("max_turn_idx"),
                F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias(
                    "n_deletes"
                ),
                F.max("kafka_offset").alias("last_offset"),
            )
            .collect()
        }
        assert set(latest) == set(want)
        for cid, w in want.items():
            g = latest[cid]
            assert g["n_events"] == w["n_events"], cid
            assert g["max_turn_idx"] == w["max_turn_idx"], cid
            assert g["n_deletes"] == w["n_deletes"], cid
            assert g["last_offset"] == w["last_offset"], cid
    finally:
        events.unpersist()
        spark.catalog.dropTempView("conv_progress")
