"""delete.as.update.key ⊂ pk semantics (reference test config:
``delete.as.update.key=RECID`` with ``pk.fields=[RECID,V_M,V_S]``,
``BufferedRecordsTest.java:108,44``): one delete event soft-deletes
every row sharing the subset key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import ConfigError, SinkConfig
from kafka_jdbc_sink_connector_spark.datagen import GenSpec, generate_cdc_events

from tests.oracle import replay
from tests.test_apply_batch import _events_df, audit_col, ev


def _cfg(**kw):
    return SinkConfig(
        pk_fields=("conv_id", "turn_idx"),
        delete_as_update_key=("conv_id",),
        n_buckets=4,
        **kw,
    )


def test_config_validation():
    assert _cfg().subset_delete_key
    assert not SinkConfig().subset_delete_key
    with pytest.raises(ConfigError, match="subset"):
        SinkConfig(delete_as_update_key=("not_a_pk_col",))
    with pytest.raises(ConfigError, match="bucketing key"):
        SinkConfig(pk_fields=("a", "b"), delete_as_update_key=("b",))


def test_subset_delete_hits_all_turns(spark, tmp_table):
    applier = CdcApplier(spark, _cfg(), tmp_table, audit_ts=audit_col())
    rows = [
        ev(1, "c", "conv-a", 0),
        ev(2, "c", "conv-a", 1),
        ev(3, "c", "conv-b", 0),
        # delete keyed by conv_id only — no turn_idx
        {"kafka_partition": 0, "kafka_offset": 4, "op": "d",
         "conv_id": "conv-a", "turn_idx": None,
         "ts": ev(4, "d", "conv-a", 0)["ts"]},
    ]
    applier.apply_batch(_events_df(spark, rows), batch_id=0)
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           applier.read_target().collect()}
    assert got[("conv-a", 0)]["op_type"] == "D"
    assert got[("conv-a", 1)]["op_type"] == "D"
    assert got[("conv-b", 0)]["op_type"] == "C"
    # non-retained values survive from the inserts
    assert got[("conv-a", 1)]["text"] == "msg conv-a/1 rev 2"


def test_upsert_after_subset_delete_revives_only_that_turn(spark, tmp_table):
    applier = CdcApplier(spark, _cfg(), tmp_table, audit_ts=audit_col())
    rows1 = [
        ev(1, "c", "conv-a", 0),
        ev(2, "c", "conv-a", 1),
        {"kafka_partition": 0, "kafka_offset": 3, "op": "d",
         "conv_id": "conv-a", "turn_idx": None,
         "ts": ev(3, "d", "conv-a", 0)["ts"]},
        ev(4, "u", "conv-a", 0, text="revived"),
    ]
    applier.apply_batch(_events_df(spark, rows1), batch_id=0)
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           applier.read_target().collect()}
    assert got[("conv-a", 0)]["op_type"] == "U"
    assert got[("conv-a", 0)]["text"] == "revived"
    assert got[("conv-a", 1)]["op_type"] == "D"


def test_guard_blocks_second_subset_delete(spark, tmp_table):
    applier = CdcApplier(spark, _cfg(), tmp_table, audit_ts=audit_col())
    d = lambda off: {"kafka_partition": 0, "kafka_offset": off, "op": "d",
                     "conv_id": "conv-a", "turn_idx": None,
                     "ts": ev(off, "d", "conv-a", 0)["ts"]}
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0), d(2)]), batch_id=0)
    ts1 = applier.read_target().collect()[0]["ts"]
    applier.apply_batch(_events_df(spark, [d(10)]), batch_id=1)
    row = applier.read_target().collect()[0]
    assert row["op_type"] == "D" and row["ts"] == ts1


def test_hard_delete_subset_key(spark, tmp_table):
    cfg = _cfg(delete_mode="delete")
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows = [
        ev(1, "c", "conv-a", 0),
        ev(2, "c", "conv-a", 1),
        ev(3, "c", "conv-b", 0),
        {"kafka_partition": 0, "kafka_offset": 4, "op": "d",
         "conv_id": "conv-a", "turn_idx": None,
         "ts": ev(4, "d", "conv-a", 0)["ts"]},
        ev(5, "c", "conv-a", 2),  # re-insert after delete survives
    ]
    applier.apply_batch(_events_df(spark, rows), batch_id=0)
    got = {(r["conv_id"], r["turn_idx"]) for r in
           applier.read_target().collect()}
    assert got == {("conv-b", 0), ("conv-a", 2)}


def test_subset_delete_matches_oracle_bulk(spark, tmp_table):
    cfg = _cfg()
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
        payload = ["conv_id", "turn_idx", "role", "text", "ts", "tool",
                   "meta_source"]
        want = replay(rows, cfg, payload)
        got = {(r["conv_id"], r["turn_idx"]): r.asDict()
               for r in applier.read_target().collect()}
        assert set(got) == set(want)
        bad = [
            (k, c, got[k].get(c), want[k].get(c))
            for k in want
            for c in ("text", "op_type", "role")
            if got[k].get(c) != want[k].get(c)
        ]
        assert not bad, bad[:10]
    finally:
        events.unpersist()
