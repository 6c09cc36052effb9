"""delete.as.update.key ⊂ pk semantics (reference test config:
``delete.as.update.key=RECID`` with ``pk.fields=[RECID,V_M,V_S]``,
``BufferedRecordsTest.java:108,44``): one delete event soft-deletes
every row sharing the subset key.

Parametrized over both write modes — copy-on-write overlays the deletes
during the merge; merge-on-read persists them as per-bucket sdel files
resolved at read time (the batches below are split so the second one
actually takes the delta path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import ConfigError, SinkConfig
from kafka_jdbc_sink_connector_spark.datagen import GenSpec, generate_cdc_events

from tests.oracle import replay
from tests.test_apply_batch import (
    _compare_to_oracle,
    _events_df,
    audit_col,
    ev,
)


def _cfg(merge_mode="cow", **kw):
    return SinkConfig(
        pk_fields=("conv_id", "turn_idx"),
        delete_as_update_key=("conv_id",),
        n_buckets=4,
        merge_mode=merge_mode,
        **kw,
    )


def _sdel(off, conv="conv-a"):
    return {"kafka_partition": 0, "kafka_offset": off, "op": "d",
            "conv_id": conv, "turn_idx": None,
            "ts": ev(off, "d", conv, 0)["ts"]}


def test_config_validation():
    assert _cfg().subset_delete_key
    assert _cfg(merge_mode="mor").subset_delete_key  # mor now supported
    assert not SinkConfig().subset_delete_key
    with pytest.raises(ConfigError, match="subset"):
        SinkConfig(delete_as_update_key=("not_a_pk_col",))
    with pytest.raises(ConfigError, match="bucketing key"):
        SinkConfig(pk_fields=("a", "b"), delete_as_update_key=("b",))


@pytest.fixture(params=["cow", "mor"])
def merge_mode(request):
    return request.param


def test_subset_delete_hits_all_turns(spark, tmp_table, merge_mode):
    applier = CdcApplier(spark, _cfg(merge_mode), tmp_table,
                         audit_ts=audit_col())
    rows0 = [
        ev(1, "c", "conv-a", 0),
        ev(2, "c", "conv-a", 1),
        ev(3, "c", "conv-b", 0),
    ]
    applier.apply_batch(_events_df(spark, rows0), batch_id=0)
    # second batch (delta commit under mor): delete keyed by conv_id
    applier.apply_batch(_events_df(spark, [_sdel(4)]), batch_id=1)
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           applier.read_target().collect()}
    assert got[("conv-a", 0)]["op_type"] == "D"
    assert got[("conv-a", 1)]["op_type"] == "D"
    assert got[("conv-b", 0)]["op_type"] == "C"
    # non-retained values survive from the inserts
    assert got[("conv-a", 1)]["text"] == "msg conv-a/1 rev 2"
    # retain field ts comes from the delete event, on BOTH turns
    assert got[("conv-a", 0)]["ts"] == got[("conv-a", 1)]["ts"]
    _compare_to_oracle(applier, rows0 + [_sdel(4)], applier.cfg)


def test_upsert_after_subset_delete_revives_only_that_turn(
    spark, tmp_table, merge_mode
):
    applier = CdcApplier(spark, _cfg(merge_mode), tmp_table,
                         audit_ts=audit_col())
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0),
                           ev(2, "c", "conv-a", 1)]),
        batch_id=0,
    )
    rows1 = [_sdel(3), ev(4, "u", "conv-a", 0, text="revived")]
    applier.apply_batch(_events_df(spark, rows1), batch_id=1)
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           applier.read_target().collect()}
    assert got[("conv-a", 0)]["op_type"] == "U"
    assert got[("conv-a", 0)]["text"] == "revived"
    assert got[("conv-a", 1)]["op_type"] == "D"


def test_guard_blocks_second_subset_delete(spark, tmp_table, merge_mode):
    applier = CdcApplier(spark, _cfg(merge_mode), tmp_table,
                         audit_ts=audit_col())
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0), _sdel(2)]), batch_id=0)
    ts1 = applier.read_target().collect()[0]["ts"]
    applier.apply_batch(_events_df(spark, [_sdel(10)]), batch_id=1)
    row = applier.read_target().collect()[0]
    assert row["op_type"] == "D" and row["ts"] == ts1


def test_intra_batch_double_subset_delete_keeps_first(
    spark, tmp_table, merge_mode
):
    """Two subset deletes in ONE batch: rows existing before both get
    retain fields from the FIRST (the guard blocks the second); a row
    upserted between them gets them from the SECOND."""
    applier = CdcApplier(spark, _cfg(merge_mode), tmp_table,
                         audit_ts=audit_col())
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0)]), batch_id=0)
    rows1 = [
        _sdel(5),
        ev(6, "c", "conv-a", 1),   # upserted between the two deletes
        _sdel(8),
    ]
    applier.apply_batch(_events_df(spark, rows1), batch_id=1)
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           applier.read_target().collect()}
    assert got[("conv-a", 0)]["op_type"] == "D"
    assert got[("conv-a", 0)]["ts"].replace(tzinfo=None) == \
        ev(5, "d", "conv-a", 0)["ts"]
    assert got[("conv-a", 1)]["op_type"] == "D"
    assert got[("conv-a", 1)]["ts"].replace(tzinfo=None) == \
        ev(8, "d", "conv-a", 0)["ts"]
    _compare_to_oracle(
        applier, [ev(1, "c", "conv-a", 0)] + rows1, applier.cfg
    )


def test_hard_delete_subset_key(spark, tmp_table, merge_mode):
    cfg = _cfg(merge_mode, delete_mode="delete")
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0),
                           ev(2, "c", "conv-a", 1),
                           ev(3, "c", "conv-b", 0)]),
        batch_id=0,
    )
    applier.apply_batch(
        _events_df(spark, [_sdel(4),
                           ev(5, "c", "conv-a", 2)]),  # re-insert survives
        batch_id=1,
    )
    got = {(r["conv_id"], r["turn_idx"]) for r in
           applier.read_target().collect()}
    assert got == {("conv-b", 0), ("conv-a", 2)}


def test_mor_sdel_compaction_folds_and_time_travel(spark, tmp_table):
    """Compaction folds sdel overlays into base files; the pre-delete
    version stays readable (time travel ignores later sdel commits)."""
    from kafka_jdbc_sink_connector_spark.lake.maintenance import compact

    applier = CdcApplier(spark, _cfg("mor"), tmp_table,
                         audit_ts=audit_col())
    r0 = applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0),
                           ev(2, "c", "conv-a", 1)]),
        batch_id=0,
    )
    applier.apply_batch(_events_df(spark, [_sdel(3)]), batch_id=1)
    t = applier.table()
    assert t.snapshot.sdel_files(), "second batch must write sdel files"
    before = {(r["conv_id"], r["turn_idx"]): r.asDict()
              for r in applier.read_target().collect()}
    assert all(v["op_type"] == "D" for v in before.values())
    # the pre-delete snapshot resolves without the sdel overlay
    old = {r["turn_idx"]: r["op_type"]
           for r in t.read(version=r0.snapshot_version).collect()}
    assert old == {0: "C", 1: "C"}
    compact(t)
    t = applier.table()
    assert not t.snapshot.sdel_files(), "compaction must fold sdels"
    after = {(r["conv_id"], r["turn_idx"]): r.asDict()
             for r in applier.read_target().collect()}
    assert before == after


def test_subset_delete_matches_oracle_bulk(spark, tmp_table, merge_mode):
    cfg = _cfg(merge_mode)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    spec = GenSpec(n_events=2000, n_conversations=40,
                   turns_per_conversation=6, delete_fraction=0.05)
    events = generate_cdc_events(spark, spec).cache()
    try:
        n = spec.n_events
        for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
            applier.apply_batch(
                events.filter((F.col("kafka_offset") >= lo)
                              & (F.col("kafka_offset") < hi)),
                batch_id=i,
            )
        rows = [r.asDict() for r in events.collect()]
        # every payload column including the retain field ts
        _compare_to_oracle(
            applier, rows, cfg, extra_payload=("tool", "meta_source")
        )
    finally:
        events.unpersist()
