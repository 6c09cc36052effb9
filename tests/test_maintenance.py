"""Compaction + vacuum keep contents identical while shrinking the
file count / snapshot history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.datagen import GenSpec, generate_cdc_events
from kafka_jdbc_sink_connector_spark.lake.maintenance import compact, vacuum

from tests.test_apply_batch import audit_col


@pytest.fixture()
def applied(spark, tmp_table):
    cfg = SinkConfig(n_buckets=4)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    events = generate_cdc_events(
        spark, GenSpec(n_events=2000, n_conversations=40,
                       turns_per_conversation=6)
    )
    for i in range(3):
        b = events.filter(
            (F.col("kafka_offset") >= i * 700)
            & (F.col("kafka_offset") < (i + 1) * 700)
        )
        applier.apply_batch(b, batch_id=i)
    return applier


def _rows(applier):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["op_type"])
        for r in applier.read_target().collect()
    )


def test_compact_preserves_contents(applied):
    before = _rows(applied)
    t = applied.table()
    n_files_before = len(t.snapshot.files())
    done = compact(t, min_files=1)
    assert done  # something compacted
    t2 = applied.table()
    assert len(t2.snapshot.files()) <= n_files_before
    # one file per compacted bucket
    for b in done:
        assert len(t2.snapshot.buckets[str(b)]) == 1
    assert _rows(applied) == before


def test_vacuum_removes_history_keeps_latest(applied, spark):
    before = _rows(applied)
    t = applied.table()
    compact(t, min_files=1)
    stats = vacuum(t, keep_versions=1)
    assert stats["removed_files"] > 0
    assert stats["removed_snapshots"] > 0
    assert t.history() == [t.version]
    assert _rows(applied) == before
    # exactly-once watermark survives vacuum
    assert t.applied_batch("default") == 2


def test_vacuum_keeps_time_travel_window(applied):
    t = applied.table()
    vacuum(t, keep_versions=2)
    hist = t.history()
    assert len(hist) == 2
    # both kept versions remain readable
    for v in hist:
        t.read(version=v).count()
