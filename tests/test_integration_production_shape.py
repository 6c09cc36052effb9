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
