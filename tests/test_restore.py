"""RESTORE (rollback-to-snapshot) semantics: a metadata-only commit
that rewinds table state AND exactly-once watermarks together, so a
stream replay after the restore converges back to the pre-restore
head (the rewind-and-reprocess operation of a CDC pipeline).

Reference anchor: the connector has no lake layer to roll back — its
recovery story is Kafka offset rewind + idempotent upsert replay
(SinkTask offset management); ``restore`` is the table-side half of
that same operation for this engine's own lake.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.lake.changes import table_changes
from kafka_jdbc_sink_connector_spark.lake.maintenance import vacuum
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

from tests.test_apply_batch import _events_df, audit_col, ev

SCHEMA = T.StructType([
    T.StructField("k", T.StringType(), False),
    T.StructField("v", T.LongType(), True),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _state(t, version=None):
    return {
        (r["k"], r["v"]) for r in t.read(version=version).collect()
    }


def test_restore_rewinds_content_and_preserves_history(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, key_fields=["k"]
    )
    t.overwrite(_df(spark, [(f"k{i}", i) for i in range(20)]))  # v1
    v1_state = _state(t)
    t.overwrite(_df(spark, [(f"k{i}", i * 100) for i in range(5)]))  # v2
    assert _state(t) != v1_state

    snap = t.restore(1)
    assert snap.version == 3
    assert snap.stats == {"restored_from": 1}
    assert snap.parent == 2
    assert _state(t) == v1_state
    # metadata-only: the restore commit wrote no data files
    assert set(snap.files()) == set(t._read_version(1).files())
    # rolled-past version remains time-travelable until vacuumed
    assert _state(t, version=2) != v1_state
    # a fresh load sees the restored state
    assert _state(LakeTable.load(spark, t.path)) == v1_state


def test_restore_rejects_current_missing_and_vacuumed(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2, key_fields=["k"]
    )
    t.overwrite(_df(spark, [("a", 1)]))  # v1
    t.overwrite(_df(spark, [("a", 2)]))  # v2
    with pytest.raises(ValueError, match="already at version"):
        t.restore(2)
    with pytest.raises(ValueError, match="not retained"):
        t.restore(99)
    # manually remove a data file the target references → refused
    victim = t._read_version(1).files()[0]
    os.unlink(os.path.join(t.path, victim))
    with pytest.raises(ValueError, match="removed by vacuum"):
        t.restore(1)
    # nothing was published by the failed attempts
    assert t.version == 2


def test_restore_after_vacuum_of_target_manifest(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2, key_fields=["k"]
    )
    t.overwrite(_df(spark, [("a", 1)]))  # v1
    t.overwrite(_df(spark, [("a", 2)]))  # v2
    vacuum(t, keep_versions=1)
    t = LakeTable.load(spark, t.path)
    with pytest.raises(ValueError, match="not retained"):
        t.restore(1)


def test_vacuum_after_restore_keeps_restored_files_live(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2, key_fields=["k"]
    )
    t.overwrite(_df(spark, [(f"k{i}", i) for i in range(10)]))  # v1
    v1_state = _state(t)
    t.overwrite(_df(spark, [("x", 0)]))  # v2
    t.restore(1)  # v3 references v1's files
    vacuum(t, keep_versions=1)
    t = LakeTable.load(spark, t.path)
    # v1/v2 manifests gone, but v1's data files survive (referenced
    # by the kept restore snapshot) and read back intact
    assert t.history() == [3]
    assert _state(t) == v1_state


def test_change_feed_across_restore_emits_inverse(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2, key_fields=["k"]
    )
    t.overwrite(_df(spark, [("a", 1), ("b", 2)]))  # v1
    t.overwrite(_df(spark, [("a", 99), ("c", 3)]))  # v2: upd a, del b, ins c
    t.restore(1)  # v3
    changes = {
        (r["k"], r["_change_type"], r["v"])
        for r in table_changes(t, 2, 3)
        .select("k", "_change_type", "v")
        .collect()
    }
    # the feed inverts v1→v2: a back to 1, b reinserted, c deleted
    assert ("a", "update", 1) in changes
    assert ("b", "insert", 2) in changes
    assert ("c", "delete", 3) in changes


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_restore_rewinds_watermarks_and_replay_converges(
    spark, tmp_path, merge_mode
):
    """The headline semantics: restore + checkpoint replay of the
    rolled-back batches reconverges to the pre-restore head state."""
    cfg = SinkConfig(n_buckets=4, merge_mode=merge_mode)
    applier = CdcApplier(
        spark, cfg, str(tmp_path / "t"), audit_ts=audit_col()
    )
    b0 = [ev(i, "u", f"c{i % 3}", i % 5) for i in range(12)]
    b1 = [ev(100 + i, "u", f"c{i % 3}", i % 5, text="rev2") for i in range(9)]
    b1 += [ev(120, "d", "c0", 0)]
    b2 = [ev(200 + i, "u", f"c{i % 4}", (i + 1) % 5, text="rev3")
          for i in range(8)]
    applier.apply_batch(_events_df(spark, b0), batch_id=0)
    applier.apply_batch(_events_df(spark, b1), batch_id=1)
    v_after_b1 = applier.table().version
    applier.apply_batch(_events_df(spark, b2), batch_id=2)

    def rows():
        return {
            tuple(r)
            for r in applier.read_target()
            .select("conv_id", "turn_idx", "role", "text", "op_type")
            .collect()
        }

    head = rows()
    t = applier.table()
    t.restore(v_after_b1)
    # watermark rewound with the state: batch 2 is unapplied again
    assert t.applied_batch("default") == 1
    # replay from checkpoint: batch 1 skips (<= watermark), batch 2
    # re-applies against the rolled-back state and reconverges
    applier.apply_batch(_events_df(spark, b1), batch_id=1)
    applier.apply_batch(_events_df(spark, b2), batch_id=2)
    assert rows() == head
