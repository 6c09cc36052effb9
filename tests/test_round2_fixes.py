"""Round-2 hardening: configurable op vocabulary, whitelist-gated
evolution, idempotent side-table writes, lineage backfill on replay,
and the un-forced df-counts join strategy in ngram dedup.

Reference anchors: custom op markers (`delete.as.update.identifier=
OP_TYPE=D`, BufferedRecordsTest.java:111-114), whitelist-restricted
field metadata (BufferedRecords.java:189), transactional side effects
(JdbcAuditDbWriter.java:84-94).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import ConfigError, SinkConfig
from kafka_jdbc_sink_connector_spark.operators.docdedup import (
    ngram_jaccard_pairs,
)

from tests.test_apply_batch import _events_df, audit_col, ev


def test_custom_op_vocabulary_deletes_apply(spark, tmp_table):
    """A reference-style op marker ('D' deletes, 'I'/'U' upserts) must
    validate and apply — not silently quarantine every delete as
    'unknown op'."""
    cfg = SinkConfig(
        n_buckets=2,
        op_insert_value="I",
        op_update_values=("U",),
        op_delete_value="D",
    )
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows = [
        ev(1, "I", "conv-a", 0),
        ev(2, "I", "conv-b", 0),
        ev(3, "U", "conv-a", 0, text="updated"),
        dict(ev(4, "D", "conv-b", 0), role=None, text=None),
    ]
    r = applier.apply_batch(_events_df(spark, rows), batch_id=0)
    assert r.n_quarantined == 0
    assert r.n_events == 4
    got = {x["conv_id"]: x for x in applier.read_target().collect()}
    assert got["conv-a"]["text"] == "updated"
    assert got["conv-b"]["op_type"] == "D"  # soft-deleted, not dropped
    lin = applier.read_lineage().collect()
    assert sum(x["n_insert"] for x in lin) == 2
    assert sum(x["n_update"] for x in lin) == 1
    assert sum(x["n_delete"] for x in lin) == 1


def test_debezium_op_still_valid_alongside_custom_delete(spark, tmp_table):
    """op_delete_value='D' with default insert/update vocabulary: 'c'
    and 'u' still validate; 'd' is now an unknown op and quarantines."""
    cfg = SinkConfig(n_buckets=2, op_delete_value="D")
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows = [
        ev(1, "c", "conv-a", 0),
        ev(2, "d", "conv-a", 0),  # not in the configured vocabulary
    ]
    r = applier.apply_batch(_events_df(spark, rows), batch_id=0)
    assert r.n_quarantined == 1
    q = applier.read_quarantine().collect()
    assert "unknown op d" in q[0]["error"]


def test_op_delete_value_collision_rejected():
    with pytest.raises(ConfigError, match="collides"):
        SinkConfig(op_delete_value="u")
    with pytest.raises(ConfigError, match="collides"):
        SinkConfig(op_delete_value="c")
    with pytest.raises(ConfigError, match="non-empty"):
        SinkConfig(op_delete_value="")


def test_evolution_respects_fields_whitelist(spark, tmp_table):
    """A new event column outside fields_whitelist must NOT evolve the
    target (it would be written permanently NULL anyway)."""
    cfg = SinkConfig(
        n_buckets=2, fields_whitelist=("role", "text", "ts")
    )
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(_events_df(spark, [ev(1, "c", "conv-a", 0)]),
                        batch_id=0)
    r = applier.apply_batch(
        _events_df(spark, [ev(2, "c", "conv-b", 0, tool="x")],
                   with_optional=("tool",)),
        batch_id=1,
    )
    assert r.evolved_columns == []
    assert "tool" not in [f.name for f in applier.table().schema.fields]
    # whitelisted new columns still evolve
    cfg2 = SinkConfig(
        n_buckets=2, fields_whitelist=("role", "text", "ts", "tool")
    )
    applier2 = CdcApplier(
        spark, cfg2, tmp_table + "_wl", audit_ts=audit_col()
    )
    applier2.apply_batch(_events_df(spark, [ev(1, "c", "conv-a", 0)]),
                         batch_id=0)
    r2 = applier2.apply_batch(
        _events_df(spark, [ev(2, "c", "conv-b", 0, tool="x")],
                   with_optional=("tool",)),
        batch_id=1,
    )
    assert r2.evolved_columns == ["tool"]


def test_replayed_batch_does_not_duplicate_quarantine(spark, tmp_table):
    """Side-table writes are batch_id-partitioned overwrites: replaying
    an applied batch (exactly-once skip) leaves exactly one copy of its
    quarantine rows and lineage partition."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows = [
        ev(1, "c", "conv-a", 0),
        dict(ev(2, "x", "conv-b", 0)),  # unknown op → quarantine
    ]
    df = _events_df(spark, rows)
    r1 = applier.apply_batch(df, batch_id=0)
    assert r1.n_quarantined == 1
    # replay: gate skips the merge, side tables must not grow
    r2 = applier.apply_batch(df, batch_id=0)
    assert r2.skipped
    assert applier.read_quarantine().count() == 1
    lin = applier.read_lineage().filter(F.col("batch_id") == 0)
    assert lin.count() == lin.select("kafka_partition").distinct().count()


def test_lineage_backfilled_when_lost_before_crash(spark, tmp_table):
    """Crash between merge commit and lineage write: on replay the
    batch is skipped by the exactly-once gate but its lineage partition
    is recomputed instead of being lost forever."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    df = _events_df(spark, [ev(1, "c", "conv-a", 0),
                            ev(2, "c", "conv-b", 0)])
    applier.apply_batch(df, batch_id=0)
    # simulate the crash: lineage partition vanishes post-commit
    part_dir = os.path.join(applier.lineage_path, "batch_id=0")
    assert os.path.isdir(part_dir)
    shutil.rmtree(part_dir)
    r = applier.apply_batch(df, batch_id=0)
    assert r.skipped
    lin = applier.read_lineage().filter(F.col("batch_id") == 0).collect()
    assert sum(x["n_insert"] for x in lin) == 2


def test_ngram_dfcounts_join_not_hint_forced(spark):
    """The df-counts side of the rare-shingle join is corpus-vocabulary
    sized; no broadcast hint may force it (AQE decides from measured
    sizes)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = ngram_jaccard_pairs(docs, threshold=0.5, k=5, max_df=20)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed
