"""One end-to-end test of the full production shape the reference is
deployed in (`BufferedRecordsTest.java:91-117`): Confluent-framed Avro
change events on a multi-topic stream, routed per topic into separate
merge-on-read lake tables, with a mid-stream schema evolution and a
tombstone delete — final state checked per table.
"""

from __future__ import annotations

import datetime as dt
import struct

from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.sources.avro import encode_record
from kafka_jdbc_sink_connector_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    parse_kafka_records,
)
from kafka_jdbc_sink_connector_spark.streaming.runner import MultiTableRunner

from tests.test_apply_batch import audit_col

KEY_SCHEMA = """
{"type": "record", "name": "k", "fields": [
  {"name": "conv_id", "type": "string"},
  {"name": "turn_idx", "type": "int"}
]}
"""

VALUE_V1 = """
{"type": "record", "name": "v", "fields": [
  {"name": "op", "type": "string"},
  {"name": "conv_id", "type": "string"},
  {"name": "turn_idx", "type": "int"},
  {"name": "role", "type": ["null", "string"]},
  {"name": "text", "type": ["null", "string"]},
  {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}}
]}
"""

#: evolution step: optional `tool` appears (mirrors schema B's optional
#: age column in BufferedRecordsTest.java:64-74)
VALUE_V2 = VALUE_V1.replace(
    '{"name": "ts",',
    '{"name": "tool", "type": ["null", "string"]},\n  {"name": "ts",',
)

TS = dt.datetime(2024, 5, 1, 8, 0, 0)


def _frame(payload: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", 11) + payload


def _wire(topic, partition, offset, key, value, schema):
    return (
        _frame(encode_record(KEY_SCHEMA, key)) if key is not None else None,
        _frame(encode_record(schema, value)) if value is not None else None,
        topic,
        partition,
        offset,
        None,
        0,
    )


def _frame_id(payload: bytes, schema_id: int) -> bytes:
    return b"\x00" + struct.pack(">I", schema_id) + payload


def test_registry_mixed_schema_subset_delete_mor(spark, tmp_path):
    """Round-3 production shape in one flow: a single micro-batch mixes
    TWO writer-schema versions under live-registry framing (per-record
    schema-id routing, BufferedRecords.java:176-184), the sink uses the
    reference's subset delete key (delete.as.update.key ⊂ pk) in
    merge-on-read mode, and the config is loaded from a verbatim
    Kafka-Connect property map."""
    cfg = SinkConfig.from_connect_properties({
        "name": "AuditDeleteSink",
        "connection.url": "jdbc:oracle:thin:@host:1521/svc",
        "insert.mode": "UPSERT",
        "pk.mode": "record_value",
        "pk.fields": "conv_id,turn_idx",
        "delete.mode": "UPDATE",
        "delete.as.update.identifier": "op_type=D",
        "delete.as.update.key": "conv_id",
        "delete.as.update.value.schema": "ts",
        "engine.merge.mode": "mor",
        "engine.n.buckets": "2",
    })
    schemas = {11: VALUE_V1, 12: VALUE_V2}

    def wire(offset, value, sid):
        return (None, _frame_id(encode_record(schemas[sid], value), sid),
                "t", 0, offset, None, 0)

    batch1 = [
        wire(1, {"op": "c", "conv_id": "a", "turn_idx": 0, "role": "user",
                 "text": "v1 rec", "ts": TS}, 11),
        # same batch, NEWER writer schema (registry rolled mid-stream)
        wire(2, {"op": "c", "conv_id": "a", "turn_idx": 1, "role": "tool",
                 "text": "v2 rec", "tool": "search", "ts": TS}, 12),
        wire(3, {"op": "c", "conv_id": "b", "turn_idx": 0, "role": "user",
                 "text": "other conv", "ts": TS}, 11),
    ]
    # batch 2: one subset-key delete (conv_id only) under v1 framing
    del_ts = dt.datetime(2024, 5, 2, 9, 0, 0)
    batch2 = [
        wire(4, {"op": "d", "conv_id": "a", "turn_idx": 0, "role": None,
                 "text": None, "ts": del_ts}, 11),
    ]

    def parse(rows):
        return parse_kafka_records(
            spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA), None, cfg,
            value_format="avro", avro_value_schemas=schemas,
        )

    applier = CdcApplier(spark, cfg, str(tmp_path / "tgt"),
                         audit_ts=audit_col())
    r1 = applier.apply_batch(parse(batch1), batch_id=0)
    assert r1.n_events == 3 and r1.n_quarantined == 0
    r2 = applier.apply_batch(parse(batch2), batch_id=1)
    assert r2.n_events == 1
    t = applier.table()
    assert t.snapshot.sdel_files(), "delete must land as a MOR sdel file"
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in applier.read_target().collect()}
    # both conv-a turns soft-deleted by the one subset delete; conv-b kept
    assert got[("a", 0)]["op_type"] == "D"
    assert got[("a", 1)]["op_type"] == "D"
    assert got[("b", 0)]["op_type"] == "C"
    # retain field ts from the delete event, on both matched rows
    for k in (("a", 0), ("a", 1)):
        assert got[k]["ts"].replace(tzinfo=None) == del_ts
    # v1 record null-backfills the v2-only column; v2 record carries it
    assert got[("a", 0)]["tool"] is None
    assert got[("a", 1)]["tool"] == "search"
    assert got[("a", 1)]["text"] == "v2 rec"


def test_avro_multitable_mor_end_to_end(spark, tmp_path):
    rows = [
        # topic A, schema v1
        _wire("transcripts_a", 0, 1, {"conv_id": "a1", "turn_idx": 0},
              {"op": "c", "conv_id": "a1", "turn_idx": 0, "role": "user",
               "text": "hello", "ts": TS}, VALUE_V1),
        _wire("transcripts_a", 0, 2, {"conv_id": "a2", "turn_idx": 0},
              {"op": "c", "conv_id": "a2", "turn_idx": 0, "role": "user",
               "text": "hi", "ts": TS}, VALUE_V1),
        # topic B interleaved
        _wire("transcripts_b", 1, 3, {"conv_id": "b1", "turn_idx": 0},
              {"op": "c", "conv_id": "b1", "turn_idx": 0, "role": "user",
               "text": "bonjour", "ts": TS}, VALUE_V1),
    ]
    rows2 = [
        # batch 2: schema evolution on topic A (tool column) + update
        _wire("transcripts_a", 0, 4, {"conv_id": "a1", "turn_idx": 0},
              {"op": "u", "conv_id": "a1", "turn_idx": 0,
               "role": "assistant", "text": "hello v2",
               "tool": "search", "ts": TS}, VALUE_V2),
        # tombstone delete on topic B (null value, key only)
        _wire("transcripts_b", 1, 5, {"conv_id": "b1", "turn_idx": 0},
              None, VALUE_V1),
    ]

    def parse(df, schema):
        return parse_kafka_records(
            df, None, SinkConfig(), value_format="avro",
            avro_value_schema=schema, avro_key_schema=KEY_SCHEMA,
            confluent_wire=True, keep_topic=True,
        )

    def factory(topic):
        return CdcApplier(
            spark,
            SinkConfig(n_buckets=2, merge_mode="mor"),
            str(tmp_path / topic),
            audit_ts=audit_col(),
        )

    runner = MultiTableRunner(factory, str(tmp_path / "ckpt"))
    raw1 = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    runner.process_batch(parse(raw1, VALUE_V1), batch_id=0)
    raw2 = spark.createDataFrame(rows2, KAFKA_WIRE_SCHEMA)
    runner.process_batch(parse(raw2, VALUE_V2), batch_id=1)

    a = {(r["conv_id"], r["turn_idx"]): r
         for r in runner.appliers["transcripts_a"].read_target().collect()}
    b = {(r["conv_id"], r["turn_idx"]): r
         for r in runner.appliers["transcripts_b"].read_target().collect()}

    assert a[("a1", 0)]["text"] == "hello v2"
    assert a[("a1", 0)]["tool"] == "search"      # evolved column applied
    assert a[("a2", 0)]["tool"] is None          # pre-evolution backfill
    assert b[("b1", 0)]["op_type"] == "D"        # tombstone soft delete
    assert b[("b1", 0)]["text"] == "bonjour"     # non-retained kept
    # batch 2 of topic A was a merge-on-read delta commit
    snap = runner.appliers["transcripts_a"].table().snapshot
    assert snap.delta_files()
    # replay of an applied batch id is skipped per table
    runner.process_batch(parse(raw2, VALUE_V2), batch_id=1)
    assert runner.appliers["transcripts_a"].table().version == snap.version
