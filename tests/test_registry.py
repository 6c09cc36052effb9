"""Schema Registry client (sources/registry.py): on-demand per-id
schema resolution feeding the multi-schema Avro decode — the live
behavior of the reference's registry-backed converters
(``schema.registry.url``; ``BufferedRecordsTest.java:94-99``)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.sources.avro import encode_record
from kafka_jdbc_sink_connector_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    parse_kafka_records,
)
from kafka_jdbc_sink_connector_spark.sources.registry import (
    DictSchemaRegistry,
    HttpSchemaRegistry,
    SchemaRegistryError,
    batch_schema_ids,
    schemas_for_batch,
)

from tests.test_avro import TS, V2_SCHEMA, VALUE_SCHEMA, _confluent


class _CountingRegistry(DictSchemaRegistry):
    def __init__(self, schemas):
        super().__init__(schemas)
        self.calls = []

    def fetch_schema(self, schema_id):
        self.calls.append(int(schema_id))
        return super().fetch_schema(schema_id)


def _mixed_batch(spark):
    v1 = {"op": "c", "conv_id": "a", "turn_idx": 0,
          "role": "user", "text": "old", "ts": TS}
    v2 = {"op": "c", "conv_id": "b", "turn_idx": 1, "role": "tool",
          "text": "new", "ts": TS, "tool": "search"}
    rows = [
        (None, _confluent(encode_record(VALUE_SCHEMA, v1), 7),
         "transcripts", 0, 1, None, 0),
        (None, _confluent(encode_record(V2_SCHEMA, v2), 9),
         "transcripts", 0, 2, None, 0),
        # tombstone: must neither be harvested nor decoded
        (None, None, "transcripts", 0, 3, None, 0),
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_mixed_version_batch_through_fake_registry(spark):
    reg = _CountingRegistry({7: VALUE_SCHEMA, 9: V2_SCHEMA, 11: "unused"})
    parsed = parse_kafka_records(
        _mixed_batch(spark), None, SinkConfig(), value_format="avro",
        schema_registry=reg,
    ).orderBy("kafka_offset").collect()
    assert parsed[0]["text"] == "old" and parsed[0]["tool"] is None
    assert parsed[1]["tool"] == "search"
    assert parsed[2]["op"] == "d"          # tombstone → delete
    # only the ids the batch actually carries were fetched
    assert sorted(reg.calls) == [7, 9]


def test_registry_miss_fails_before_decode(spark):
    reg = DictSchemaRegistry({7: VALUE_SCHEMA})
    with pytest.raises(SchemaRegistryError, match="unknown schema id 9"):
        parse_kafka_records(
            _mixed_batch(spark), None, SinkConfig(),
            value_format="avro", schema_registry=reg,
        )


def test_all_tombstone_batch_uses_cached_or_pinned_shape(spark):
    """A tombstone-only micro-batch (normal mid-stream: a delete
    burst) must NOT kill a registry-driven pipeline: the column shape
    comes from the client's known schemas, or from an explicitly
    pinned value_schema; only a cold client with neither fails."""
    from kafka_jdbc_sink_connector_spark.sources.avro import (
        avro_schema_to_struct,
    )

    rows = [(None, None, "transcripts", 0, 1, None, 0)]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    # client knows schemas (dict-backed / warmed HTTP cache): decode
    # shape = known superset, tombstone becomes a delete event
    parsed = parse_kafka_records(
        raw, None, SinkConfig(), value_format="avro",
        schema_registry=DictSchemaRegistry({7: VALUE_SCHEMA}),
    ).collect()
    assert parsed[0]["op"] == "d" and parsed[0]["text"] is None
    # cold client + pinned value_schema: shape from the caller, no
    # registry traffic at all
    class _Exploding(DictSchemaRegistry):
        def fetch_schema(self, schema_id):
            raise AssertionError("must not fetch for tombstones")

    parsed2 = parse_kafka_records(
        raw, avro_schema_to_struct(VALUE_SCHEMA), SinkConfig(),
        value_format="avro", schema_registry=_Exploding({}),
    ).collect()
    assert parsed2[0]["op"] == "d"
    # cold client, nothing pinned, subject resolution unsupported by
    # the dict fake: genuinely undeterminable
    with pytest.raises(ValueError, match="resolve no value shape"):
        parse_kafka_records(
            raw, None, SinkConfig(), value_format="avro",
            schema_registry=DictSchemaRegistry({}),
        )


def test_bad_frames_are_not_harvested(spark):
    """Short/bad-magic frames don't reach the registry — they flow to
    the decoder and fail there with the frame error (parity with the
    no-registry path)."""
    good = _confluent(encode_record(VALUE_SCHEMA, {
        "op": "c", "conv_id": "a", "turn_idx": 0,
        "role": None, "text": None, "ts": TS}), 7)
    rows = [
        (None, good, "t", 0, 1, None, 0),
        (None, b"\x00\x00\x00", "t", 0, 2, None, 0),   # truncated
        (None, b"\x01" + good[1:], "t", 0, 3, None, 0),  # bad magic
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    assert batch_schema_ids(raw, raw["value"]) == [7]
    reg = _CountingRegistry({7: VALUE_SCHEMA})
    parsed = parse_kafka_records(
        raw, None, SinkConfig(), value_format="avro",
        schema_registry=reg, avro_decoder="python",
    )
    assert reg.calls == [7]
    with pytest.raises(Exception, match="not Confluent wire format"):
        parsed.collect()


def test_record_key_mode_resolves_key_schemas_too(spark):
    key_schema = (
        '{"type": "record", "name": "k", "fields": ['
        '{"name": "conv_id", "type": "string"},'
        '{"name": "turn_idx", "type": "int"}]}'
    )
    v = {"op": "u", "conv_id": "ignored", "turn_idx": 0,
         "role": None, "text": "x", "ts": TS}
    rows = [
        (_confluent(encode_record(key_schema,
                                  {"conv_id": "a", "turn_idx": 1}), 3),
         _confluent(encode_record(VALUE_SCHEMA, v), 7),
         "t", 0, 1, None, 0),
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    reg = _CountingRegistry({3: key_schema, 7: VALUE_SCHEMA})
    parsed = parse_kafka_records(
        raw, None, SinkConfig(), pk_mode="record_key",
        value_format="avro", schema_registry=reg,
    ).collect()
    assert (parsed[0]["conv_id"], parsed[0]["turn_idx"]) == ("a", 1)
    assert sorted(reg.calls) == [3, 7]


# --- HTTP client ------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    store: dict[int, str] = {}
    subjects: dict[str, tuple[int, str]] = {}  # subject → (id, schema)
    hits: list[str] = []
    fail_next: list[int] = []  # sids whose next request 500s

    def _reply(self, body: dict):
        raw = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type",
                         "application/vnd.schemaregistry.v1+json")
        self.end_headers()
        self.wfile.write(raw)

    def do_GET(self):  # noqa: N802 — http.server API
        _Handler.hits.append(self.path)
        if self.path.startswith("/subjects/"):
            # /subjects/{subject}/versions/latest
            subject = self.path.split("/")[2]
            hit = _Handler.subjects.get(subject)
            if hit is None:
                self.send_response(404)
                self.end_headers()
                return
            sid, schema = hit
            self._reply({"subject": subject, "version": 1,
                         "id": sid, "schema": schema})
            return
        sid = int(self.path.rsplit("/", 1)[1])
        if sid in _Handler.fail_next:
            _Handler.fail_next.remove(sid)
            self.send_response(500)
            self.end_headers()
            return
        schema = _Handler.store.get(sid)
        if schema is None:
            self.send_response(404)
            self.end_headers()
            return
        self._reply({"schema": schema})

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_registry():
    _Handler.store = {7: VALUE_SCHEMA, 9: V2_SCHEMA}
    _Handler.subjects = {"transcripts-value": (9, V2_SCHEMA)}
    _Handler.hits = []
    _Handler.fail_next = []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield HttpSchemaRegistry(
            f"http://127.0.0.1:{srv.server_port}",
            timeout=2.0, max_retries=2, backoff_sec=0.01,
        )
    finally:
        srv.shutdown()


def test_http_registry_fetch_cache_retry_miss(http_registry):
    reg = http_registry
    assert json.loads(reg.fetch_schema(7))["name"] == "transcript_event"
    # cache: the second fetch makes no HTTP request
    n = len(_Handler.hits)
    assert reg.fetch_schema(7) == reg.fetch_schema(7)
    assert len(_Handler.hits) == n
    # transient 500 retried transparently
    _Handler.fail_next = [9]
    assert "tool" in reg.fetch_schema(9)
    assert _Handler.hits.count("/schemas/ids/9") == 2
    # 404 = miss, immediate (exactly one request, no retries)
    with pytest.raises(SchemaRegistryError, match="unknown schema id 42"):
        reg.fetch_schema(42)
    assert _Handler.hits.count("/schemas/ids/42") == 1


def test_http_registry_unreachable_bounded_retries():
    reg = HttpSchemaRegistry("http://127.0.0.1:9", timeout=0.2,
                             max_retries=1, backoff_sec=0.01)
    with pytest.raises(SchemaRegistryError, match="unreachable"):
        reg.fetch_schema(7)


def test_http_registry_end_to_end_decode(spark, http_registry):
    parsed = parse_kafka_records(
        _mixed_batch(spark), None, SinkConfig(), value_format="avro",
        schema_registry=http_registry,
    ).orderBy("kafka_offset").collect()
    assert parsed[0]["text"] == "old" and parsed[1]["tool"] == "search"


def test_cfg_schema_registry_url_drives_resolution(spark, http_registry):
    """schema_registry_url from the Connect properties is actually
    consumed: parse_kafka_records builds a process-cached HTTP client
    from it when no explicit registry/schemas were passed."""
    from kafka_jdbc_sink_connector_spark.sources.registry import (
        client_for,
    )

    cfg = SinkConfig(schema_registry_url=http_registry.base_url)
    parsed = parse_kafka_records(
        _mixed_batch(spark), None, cfg, value_format="avro",
    ).orderBy("kafka_offset").collect()
    assert parsed[0]["text"] == "old" and parsed[1]["tool"] == "search"
    # one client (= one cache) per URL across the process
    assert client_for(http_registry.base_url) is client_for(
        http_registry.base_url
    )


def test_streaming_frame_rejected_with_guidance(spark, tmp_path):
    """Registry harvesting aggregates the batch — impossible on an
    unbounded stream; the error must say to use foreachBatch."""
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(None, None, "t", 0, 1, None, 0)], KAFKA_WIRE_SCHEMA
    ).write.parquet(src)
    stream = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="foreachBatch"):
        parse_kafka_records(
            stream, None, SinkConfig(), value_format="avro",
            schema_registry=DictSchemaRegistry({7: VALUE_SCHEMA}),
        )


def test_connect_properties_accept_registry_url():
    cfg = SinkConfig.from_connect_properties({
        "pk.fields": "conv_id,turn_idx",
        "value.converter": "io.confluent.connect.avro.AvroConverter",
        "value.converter.schema.registry.url": "http://registry:8081",
    })
    assert cfg.schema_registry_url == "http://registry:8081"
    # bare schema.registry.url works too
    cfg2 = SinkConfig.from_connect_properties(
        {"schema.registry.url": "http://r:8081"}
    )
    assert cfg2.schema_registry_url == "http://r:8081"


def test_schemas_for_batch_empty_frame(spark):
    raw = spark.createDataFrame(
        [(None,)], "value binary"
    )
    from pyspark.sql import functions as F

    assert schemas_for_batch(
        raw, F.col("value"), DictSchemaRegistry({})
    ) == {}


def test_cold_start_tombstone_batch_pins_subject(spark, http_registry):
    """A COLD client + tombstone-only FIRST batch: no id to harvest,
    nothing cached — the topic still names the subject (Confluent
    TopicNameStrategy '{topic}-value'), so the value shape resolves
    from /subjects/{subject}/versions/latest instead of raising."""
    raw = spark.createDataFrame(
        [(None, None, "transcripts", 0, 1, None, 0)], KAFKA_WIRE_SCHEMA
    )
    parsed = parse_kafka_records(
        raw, None, SinkConfig(), value_format="avro",
        schema_registry=http_registry,
    ).collect()
    assert parsed[0]["op"] == "d"
    # shape came from the subject's latest version (V2 carries 'tool')
    assert "tool" in parsed[0].asDict()
    assert any("/subjects/transcripts-value/versions/latest" == h
               for h in _Handler.hits)
    # and the resolved id is now scope-cached: a second tombstone-only
    # batch resolves without registry traffic
    n = len(_Handler.hits)
    parse_kafka_records(
        raw, None, SinkConfig(), value_format="avro",
        schema_registry=http_registry,
    ).collect()
    assert len(_Handler.hits) == n


def test_tombstone_fallback_scoped_to_value_and_topic(spark,
                                                      http_registry):
    """The tombstone-only shape fallback must use only VALUE-side ids
    harvested for THIS topic — never key schemas (record_key mode) or
    another topic's schemas accumulated in the shared client cache."""
    key_schema = json.dumps({
        "type": "record", "name": "k", "fields": [
            {"name": "conv_id", "type": "string"},
            {"name": "turn_idx", "type": "int"},
        ],
    })
    _Handler.store[21] = key_schema
    v1 = {"op": "c", "conv_id": "a", "turn_idx": 0,
          "role": "user", "text": "x", "ts": TS}
    k1 = {"conv_id": "a", "turn_idx": 0}
    batch1 = spark.createDataFrame([
        (_confluent(encode_record(key_schema, k1), 21),
         _confluent(encode_record(VALUE_SCHEMA, v1), 7),
         "transcripts", 0, 1, None, 0),
    ], KAFKA_WIRE_SCHEMA)
    parse_kafka_records(
        batch1, None, SinkConfig(), pk_mode="record_key",
        value_format="avro", schema_registry=http_registry,
    ).collect()
    # client cache now holds value id 7 AND key id 21; the value-side
    # scoped view must exclude the key schema
    assert set(http_registry.known_schemas()) == {7, 21}
    assert set(http_registry.known_schemas("value:transcripts")) == {7}
    assert set(http_registry.known_schemas("key:transcripts")) == {21}
    # a different topic's tombstone-only batch must NOT inherit the
    # transcripts schemas: with no subject registered for it, it fails
    other = spark.createDataFrame(
        [(None, None, "audit", 0, 9, None, 0)], KAFKA_WIRE_SCHEMA
    )
    with pytest.raises(ValueError, match="audit-value"):
        parse_kafka_records(
            other, None, SinkConfig(), value_format="avro",
            schema_registry=http_registry,
        )


def test_empty_harvest_malformed_frames_keep_frame_error(spark):
    """Empty harvest + caller-pinned value_schema: NON-NULL values in
    such a batch are by definition malformed (no well-formed frame was
    harvested) and must raise the decoders' frame error — not silently
    become NULL structs quarantined with a misleading reason."""
    from kafka_jdbc_sink_connector_spark.sources.avro import (
        avro_schema_to_struct,
    )

    rows = [
        (None, None, "t", 0, 1, None, 0),            # tombstone: fine
        (None, b"\x01garbage", "t", 0, 2, None, 0),  # bad magic byte
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    parsed = parse_kafka_records(
        raw, avro_schema_to_struct(VALUE_SCHEMA), SinkConfig(),
        value_format="avro", schema_registry=DictSchemaRegistry({}),
    )
    with pytest.raises(Exception, match="magic byte"):
        parsed.collect()
    # tombstone-only batch through the same path still decodes cleanly
    only_tomb = spark.createDataFrame(rows[:1], KAFKA_WIRE_SCHEMA)
    out = parse_kafka_records(
        only_tomb, avro_schema_to_struct(VALUE_SCHEMA), SinkConfig(),
        value_format="avro", schema_registry=DictSchemaRegistry({}),
    ).collect()
    assert out[0]["op"] == "d"


def test_stream_runner_record_parser_live_registry_e2e(
    spark, http_registry, tmp_path
):
    """Verdict-item e2e: binary Confluent wire frames flow through a
    file stream into CdcStreamRunner's record_parser hook (the
    engine-plumbed converter layer), decoding via the LIVE local HTTP
    registry inside the managed foreachBatch — mixed writer-schema
    versions, deletes, exactly-once across restart."""
    from kafka_jdbc_sink_connector_spark.apply import CdcApplier
    from kafka_jdbc_sink_connector_spark.sources.cdc import file_stream
    from kafka_jdbc_sink_connector_spark.streaming.runner import (
        CdcStreamRunner,
    )

    from kafka_jdbc_sink_connector_spark.config import DeleteMode

    cfg = SinkConfig(n_buckets=2, delete_mode=DeleteMode.DELETE)
    src = str(tmp_path / "wire")
    ckpt = str(tmp_path / "ckpt")

    def frame(schema, sid, **rec):
        return _confluent(encode_record(schema, rec), sid)

    def v1(op, conv, turn, text):
        return frame(VALUE_SCHEMA, 7, op=op, conv_id=conv,
                     turn_idx=turn, role="user", text=text, ts=TS)

    def v2(op, conv, turn, text, tool):
        return frame(V2_SCHEMA, 9, op=op, conv_id=conv, turn_idx=turn,
                     role="tool", text=text, ts=TS, tool=tool)

    chunk1 = [
        (None, v1("c", "a", 0, "one"), "transcripts", 0, 0, None, 0),
        (None, v1("c", "b", 0, "two"), "transcripts", 0, 1, None, 0),
        (None, v1("c", "c", 0, "three"), "transcripts", 0, 2, None, 0),
    ]
    chunk2 = [
        # newer writer schema updates a; delete c via op (the V2
        # records exercise per-record id routing inside the runner)
        (None, v2("u", "a", 0, "one-v2", "search"),
         "transcripts", 0, 3, None, 0),
        (None, v1("d", "c", 0, None), "transcripts", 0, 4, None, 0),
    ]
    spark.createDataFrame(chunk1, KAFKA_WIRE_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(chunk2, KAFKA_WIRE_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    def parser(df):
        return parse_kafka_records(
            df, None, cfg, value_format="avro",
            schema_registry=http_registry,
        )

    applier = CdcApplier(spark, cfg, str(tmp_path / "tgt"))
    runner = CdcStreamRunner(applier, ckpt, record_parser=parser)
    stream = file_stream(spark, src, KAFKA_WIRE_SCHEMA,
                         max_files_per_trigger=1)
    results = runner.run_available(stream)
    assert len(results) >= 2  # really micro-batched

    got = {(r["conv_id"], r["turn_idx"]): r.asDict()
           for r in applier.read_target().collect()}
    assert set(got) == {("a", 0), ("b", 0)}      # c deleted
    assert got[("a", 0)]["text"] == "one-v2"
    assert got[("a", 0)]["tool"] == "search"      # evolved column
    assert got[("b", 0)]["text"] == "two"
    v_after = applier.table().version

    # restart from the same checkpoint with no new data: nothing
    # re-applied (exactly-once via checkpoint + batch watermark)
    applier2 = CdcApplier(spark, cfg, str(tmp_path / "tgt"))
    runner2 = CdcStreamRunner(applier2, ckpt, record_parser=parser)
    runner2.run_available(
        file_stream(spark, src, KAFKA_WIRE_SCHEMA,
                    max_files_per_trigger=1))
    assert applier2.table().version == v_after

    # new data after restart applies exactly once
    chunk3 = [(None, v2("u", "b", 0, "two-v2", None),
               "transcripts", 0, 5, None, 0)]
    spark.createDataFrame(chunk3, KAFKA_WIRE_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    runner3 = CdcStreamRunner(
        CdcApplier(spark, cfg, str(tmp_path / "tgt")), ckpt,
        record_parser=parser)
    runner3.run_available(
        file_stream(spark, src, KAFKA_WIRE_SCHEMA,
                    max_files_per_trigger=1))
    got2 = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in applier2.read_target().collect()}
    assert got2 == {("a", 0): "one-v2", ("b", 0): "two-v2"}


def test_multi_topic_tombstone_batch_resolves_each_topic(
    spark, http_registry
):
    """Strict per-topic shape fallback: in a tombstone-only batch with
    topics A (warm scoped cache) and B (cold), topic B must resolve
    its OWN subject — silently inheriting A's shape would drop
    B-specific columns."""
    # warm topic A's value scope with a real frame
    v1 = {"op": "c", "conv_id": "a", "turn_idx": 0,
          "role": "user", "text": "x", "ts": TS}
    warm = spark.createDataFrame(
        [(None, _confluent(encode_record(VALUE_SCHEMA, v1), 7),
          "transcripts", 0, 1, None, 0)], KAFKA_WIRE_SCHEMA)
    parse_kafka_records(warm, None, SinkConfig(), value_format="avro",
                        schema_registry=http_registry).collect()
    # register a subject for topic B with a DIFFERENT (v2) shape
    _Handler.subjects["audit-value"] = (9, V2_SCHEMA)
    both = spark.createDataFrame(
        [(None, None, "transcripts", 0, 2, None, 0),
         (None, None, "audit", 0, 3, None, 0)], KAFKA_WIRE_SCHEMA)
    parsed = parse_kafka_records(
        both, None, SinkConfig(), value_format="avro",
        schema_registry=http_registry,
    ).collect()
    # the decode superset includes B's v2-only column because B's
    # subject was resolved, not inherited from A
    assert "tool" in parsed[0].asDict()
    assert any("/subjects/audit-value/versions/latest" == h
               for h in _Handler.hits)
    # and with B's subject UNregistered, the batch fails loudly
    del _Handler.subjects["audit-value"]
    reg2 = HttpSchemaRegistry(http_registry.base_url, timeout=2.0,
                              max_retries=1, backoff_sec=0.01)
    with pytest.raises(ValueError, match="audit-value"):
        parse_kafka_records(
            both, None, SinkConfig(), value_format="avro",
            schema_registry=reg2,
        )


def test_topicless_frames_still_harvest(spark):
    """A caller-trimmed frame (no topic column) keeps working through
    the registry path: ids harvest via the anonymous single-scope
    fallback (no scoped cache / subject pinning available to it)."""
    v1 = {"op": "c", "conv_id": "a", "turn_idx": 0,
          "role": "user", "text": "x", "ts": TS}
    raw = spark.createDataFrame(
        [(_confluent(encode_record(VALUE_SCHEMA, v1), 7),)],
        "value binary",
    ).selectExpr(
        "CAST(NULL AS BINARY) AS key", "value",
        "0 AS partition", "CAST(1 AS LONG) AS offset",
    )
    reg = _CountingRegistry({7: VALUE_SCHEMA})
    parsed = parse_kafka_records(
        raw, None, SinkConfig(), value_format="avro",
        schema_registry=reg,
    ).collect()
    assert parsed[0]["text"] == "x"
    assert reg.calls == [7]


# --- subject-name strategies (cold-start resolution) -----------------


def test_value_subject_for_strategies():
    from kafka_jdbc_sink_connector_spark.sources.kafka import (
        value_subject_for,
    )

    assert value_subject_for("t", SinkConfig()) == "t-value"
    rec = SinkConfig(subject_name_strategy="record",
                     subject_record_name="com.example.Transcript")
    assert value_subject_for("t", rec) == "com.example.Transcript"
    tr = SinkConfig(subject_name_strategy="topic_record",
                    subject_record_name="com.example.Transcript")
    assert value_subject_for("t", tr) == "t-com.example.Transcript"
    # record-based strategies without a configured record name cannot
    # cold-start (a tombstone names no record) — fail with guidance
    with pytest.raises(ValueError, match="subject_record_name"):
        value_subject_for(
            "t", SinkConfig(subject_name_strategy="record"))


@pytest.mark.parametrize(
    "strategy,record_name,subject",
    [
        ("topic", None, "transcripts-value"),
        ("record", "com.example.Transcript", "com.example.Transcript"),
        ("topic_record", "com.example.Transcript",
         "transcripts-com.example.Transcript"),
    ],
)
def test_cold_start_resolves_under_each_strategy(
    spark, http_registry, strategy, record_name, subject
):
    """A cold tombstone-only batch resolves its value shape from the
    subject named by the CONFIGURED strategy — TopicName, RecordName,
    and TopicRecordName all land on their registry subject."""
    _Handler.subjects = {subject: (9, V2_SCHEMA)}
    cfg = SinkConfig(subject_name_strategy=strategy,
                     subject_record_name=record_name)
    raw = spark.createDataFrame(
        [(None, None, "transcripts", 0, 1, None, 0)], KAFKA_WIRE_SCHEMA
    )
    parsed = parse_kafka_records(
        raw, None, cfg, value_format="avro",
        schema_registry=http_registry,
    ).collect()
    assert parsed[0]["op"] == "d"
    assert "tool" in parsed[0].asDict()  # V2 shape from that subject
    assert any(h == f"/subjects/{subject}/versions/latest"
               for h in _Handler.hits)
