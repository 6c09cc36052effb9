"""Kafka source: reader construction + record parsing.

The reference consumes ``SinkRecord``s handed over by the Connect
runtime (``JdbcAuditSinkTask.put``, ``JdbcAuditSinkTask.java:62-121``);
the Spark equivalent reads the topic directly. Two separable pieces:

* :func:`kafka_stream` — builds the ``readStream.format("kafka")``
  DataFrame (requires the spark-sql-kafka jars on the cluster; the
  sandbox image lacks them, so this raises a clear error there — the
  parsing below is fully testable without Kafka). Vendoring probes:
  2026-08-17 (r6) and 2026-08-18 (r7) — no jar anywhere on the image
  (`find / -name '*spark-sql-kafka*'`) and no route to Maven Central
  (DNS resolution fails), so the broker connection itself remains the
  one untestable hop; wire-frame parsing, Confluent framing, the
  registry client, and the runner-integrated decode are all covered.
* :func:`parse_kafka_records` — turns Kafka's wire schema
  (key/value binary + topic/partition/offset/timestamp) into the
  engine's change-event frame. Supports:

  - JSON-encoded key and value structs,
  - Avro-encoded key/value (``value_format="avro"``) with optional
    Confluent wire-format framing — the reference's production format
    (``BufferedRecordsTest.java:94-99``); see :mod:`.avro` for the
    spark-avro / fallback decoder split,
  - **pk_mode=record_key**: key fields taken from the record key
    (the reference hard-codes record_value, ``BufferedRecords.java:45``;
    the engine supports both),
  - **tombstone handling**: a NULL value with a non-null key is a
    delete event (Debezium tombstone → op='d', payload NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.config import SinkConfig


def value_subject_for(topic: str, cfg: SinkConfig) -> str:
    """Registry subject for a topic's VALUE schema under the
    configured Confluent subject-name strategy — used only for
    cold-start resolution (a tombstone-only first batch embeds no
    schema id, so the subject must come from config). Warm-path
    resolution is by embedded id and strategy-independent.

    * ``topic`` (TopicNameStrategy, Confluent default): ``{topic}-value``
    * ``record`` (RecordNameStrategy): the fully-qualified record name
      — one subject for all topics
    * ``topic_record`` (TopicRecordNameStrategy):
      ``{topic}-{record_name}``

    The record-based strategies read the record name off the value
    being serialized; tombstones have none, so they require
    ``cfg.subject_record_name``.
    """
    s = cfg.subject_name_strategy
    if s == "topic":
        return f"{topic}-value"
    if not cfg.subject_record_name:
        raise ValueError(
            f"subject_name_strategy={s!r} needs subject_record_name "
            f"(value.converter.value.subject.record.name) for cold-start "
            f"subject resolution — a tombstone-only batch names no record"
        )
    if s == "record":
        return cfg.subject_record_name
    return f"{topic}-{cfg.subject_record_name}"


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """``readStream.format("kafka")`` with engine defaults.

    ``maxOffsetsPerTrigger`` is the back-pressure analog of the
    reference's ``batch.size``/retry backoff (``JdbcAuditSinkTask.java:
    96-103``): it bounds micro-batch size so a recovering query does
    not take one giant batch.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


#: Kafka's fixed wire schema (what `format("kafka")` yields) — used by
#: tests to fabricate record batches without a broker.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def parse_kafka_records(
    records: DataFrame,
    value_schema: T.StructType | None,
    cfg: SinkConfig,
    key_schema: T.StructType | None = None,
    pk_mode: str = "record_value",
    keep_topic: bool = False,
    value_format: str = "json",
    avro_value_schema: str | None = None,
    avro_key_schema: str | None = None,
    confluent_wire: bool = False,
    avro_decoder: str = "auto",
    avro_value_schemas: dict[int, str] | None = None,
    avro_key_schemas: dict[int, str] | None = None,
    schema_registry=None,
) -> DataFrame:
    """Kafka wire records → engine change-event DataFrame.

    Column mapping (SURVEY.md §1 table): ``partition`` →
    ``kafka_partition``, ``offset`` → ``kafka_offset``, value JSON/Avro
    → payload columns, tombstones → op='d'.

    ``value_format="avro"`` decodes the binary key/value with the
    writer schemas given as Avro JSON (``avro_value_schema`` /
    ``avro_key_schema``); ``value_schema``/``key_schema`` may then be
    omitted (derived from the Avro schema). ``confluent_wire`` strips
    the Schema Registry framing byte+id first.

    ``avro_value_schemas`` (a schema id → writer schema JSON map)
    enables Schema-Registry-style MULTI-schema decode instead: each
    record routes by the id embedded in its Confluent frame, and the
    batch decodes to the superset of all versions (older records
    null-backfill newer fields) — one micro-batch may carry several
    writer-schema versions, as under a live registry
    (``BufferedRecords.java:176-184``). Framing is implied.

    ``schema_registry`` (a :class:`~.registry.SchemaRegistryClient`,
    e.g. ``HttpSchemaRegistry(cfg.schema_registry_url)``) resolves the
    id → schema maps ON DEMAND instead: the batch's distinct embedded
    ids are harvested (one tiny aggregation) and fetched through the
    client's cache — the live-registry behavior of the reference's
    converters. Unknown ids fail loudly before decode is scheduled.
    Explicit ``avro_value_schemas``/``avro_key_schemas`` take
    precedence over the registry.
    """
    if pk_mode not in ("record_value", "record_key"):
        raise ValueError(f"unsupported pk_mode {pk_mode!r}")
    if value_format not in ("json", "avro"):
        raise ValueError(f"unsupported value_format {value_format!r}")

    if value_format == "avro":
        from kafka_jdbc_sink_connector_spark.sources import avro as avro_mod

        if schema_registry is None and getattr(
            cfg, "schema_registry_url", None
        ):
            # the converters' schema.registry.url from the Connect
            # properties: resolve through one process-wide cached HTTP
            # client per URL (the cache survives across micro-batches)
            from kafka_jdbc_sink_connector_spark.sources.registry import (
                client_for,
            )

            schema_registry = client_for(cfg.schema_registry_url)
        if schema_registry is not None:
            if records.isStreaming:
                # id harvesting is one tiny batch aggregation — legal
                # inside foreachBatch (where each micro-batch is a
                # plain DataFrame), impossible on the unbounded stream
                raise ValueError(
                    "schema_registry resolution runs a per-batch id "
                    "harvest and cannot be applied to a streaming "
                    "DataFrame directly; call parse_kafka_records on "
                    "each micro-batch inside foreachBatch, or "
                    "pre-resolve avro_value_schemas"
                )
            from kafka_jdbc_sink_connector_spark.sources.registry import (
                SchemaRegistryError,
                harvest_for_batch,
            )

            if avro_value_schemas is None and avro_value_schema is None:
                # per-topic harvest + value-side scope recording: the
                # shared client also caches other pipelines' (and
                # key-side) schemas, which must never leak into a
                # topic's shape fallback below
                avro_value_schemas, by_topic = harvest_for_batch(
                    records, F.col("value"), schema_registry,
                    scope_prefix="value",
                )
                # empty harvest = tombstone-only / all-malformed batch
                # (a delete burst mid-stream is normal). Tombstones
                # bypass value decode entirely, so all that is needed
                # is a column SHAPE: an explicit value_schema pins it
                # exactly (decode skipped below); otherwise EVERY topic
                # in the batch must resolve its own shape — from the
                # value-side schemas cached for THAT topic, else
                # cold-start subject resolution under the configured
                # Confluent subject-name strategy (value_subject_for:
                # topic | record | topic_record). Strict
                # per topic: silently decoding topic B's rows with
                # topic A's shape would drop B-specific columns.
                if not avro_value_schemas and value_schema is None:
                    topics = [
                        t for t in sorted(by_topic, key=str)
                        if t is not None
                    ]
                    cached: dict[int, str] = {}
                    errs: list[str] = []
                    for t in topics:
                        got = schema_registry.known_schemas(
                            scope=f"value:{t}"
                        )
                        if not got:
                            try:
                                sid, sj = schema_registry.fetch_latest(
                                    value_subject_for(t, cfg)
                                )
                            except SchemaRegistryError as e:
                                errs.append(str(e))
                                continue
                            got = {sid: sj}
                            schema_registry.note_scope(
                                f"value:{t}", [sid]
                            )
                        cached.update(got)
                    avro_value_schemas = cached
                    if errs or not avro_value_schemas:
                        raise ValueError(
                            "batch carries no well-formed Confluent "
                            "value frames, no value_schema was given, "
                            "and these topics resolve no value shape "
                            "(no scoped cache, subject resolution "
                            "failed): "
                            + ("; ".join(errs) if errs
                               else "batch names no topics")
                            + "; supply avro_value_schema(s) or "
                            "value_schema explicitly"
                        )
            if (
                pk_mode == "record_key"
                and avro_key_schemas is None
                and avro_key_schema is None
            ):
                avro_key_schemas, _ = harvest_for_batch(
                    records, F.col("key"), schema_registry,
                    scope_prefix="key",
                )
                if not avro_key_schemas:
                    # no cache fallback here (unlike values): in
                    # record_key mode every routable record MUST carry
                    # a framed key — an empty harvest means the batch
                    # has none, which no schema choice can fix. Without
                    # this guard the empty dict would slip past the
                    # is-None checks and surface as a low-level
                    # AvroDecodeError
                    raise ValueError(
                        "pk_mode='record_key' but the batch carries no "
                        "well-formed Confluent key frames to resolve; "
                        "supply avro_key_schema(s) explicitly"
                    )
        if avro_value_schema is None and avro_value_schemas is None:
            raise ValueError(
                "value_format='avro' requires avro_value_schema or "
                "avro_value_schemas"
            )
        if (
            pk_mode == "record_key"
            and avro_key_schema is None
            and avro_key_schemas is None
        ):
            # a Spark key_schema alone would pass the generic check
            # below but no __k struct would ever be decoded — fail with
            # a config error, not an unresolved-column AnalysisException
            raise ValueError(
                "value_format='avro' with pk_mode='record_key' requires "
                "avro_key_schema (the Avro writer schema of the record "
                "key)"
            )
        spark = records.sparkSession
        if avro_value_schemas is not None:
            if not avro_value_schemas:
                # registry path, no WELL-FORMED frames in the batch,
                # shape pinned by the caller's value_schema. Tombstones
                # (NULL values) bypass this expression via the
                # isNotNull guard below; any non-null value here failed
                # the magic-byte/length harvest check, so it must fail
                # with the decoders' frame error — not silently decode
                # to a NULL struct and quarantine as 'null op' (the
                # decoder contract: same inputs fail identically)
                decoded = F.raise_error(
                    F.lit("not Confluent wire format (magic byte != 0)")
                ).cast(
                    T.StructType(
                        [T.StructField(f.name, f.dataType, True)
                         for f in value_schema.fields]
                    )
                )
            else:
                if value_schema is None:
                    value_schema = avro_mod.superset_struct(
                        avro_value_schemas
                    )
                decoded = avro_mod.avro_decode_multi(
                    spark, F.col("value"), avro_value_schemas,
                    decoder=avro_decoder,
                )
        else:
            if value_schema is None:
                value_schema = avro_mod.avro_schema_to_struct(
                    avro_value_schema
                )
            decoded = avro_mod.avro_decode_column(
                spark, F.col("value"), avro_value_schema,
                confluent_wire=confluent_wire, decoder=avro_decoder,
            )
        # a tombstone's value is NULL: bypass the decoder so it cannot
        # trip on the missing payload
        val = F.when(F.col("value").isNotNull(), decoded)
        out = records.withColumn("__v", val)
        if avro_key_schemas is not None:
            if key_schema is None:
                key_schema = avro_mod.superset_struct(avro_key_schemas)
            out = out.withColumn(
                "__k",
                F.when(
                    F.col("key").isNotNull(),
                    avro_mod.avro_decode_multi(
                        spark, F.col("key"), avro_key_schemas,
                        decoder=avro_decoder,
                    ),
                ),
            )
        elif avro_key_schema is not None:
            if key_schema is None:
                key_schema = avro_mod.avro_schema_to_struct(avro_key_schema)
            out = out.withColumn(
                "__k",
                F.when(
                    F.col("key").isNotNull(),
                    avro_mod.avro_decode_column(
                        spark, F.col("key"), avro_key_schema,
                        confluent_wire=confluent_wire, decoder=avro_decoder,
                    ),
                ),
            )
    else:
        if value_schema is None:
            raise ValueError("value_format='json' requires value_schema")
        val = F.from_json(F.col("value").cast("string"), value_schema)
        out = records.withColumn("__v", val)
        if key_schema is not None:
            out = out.withColumn(
                "__k", F.from_json(F.col("key").cast("string"), key_schema)
            )
    if pk_mode == "record_key" and key_schema is None:
        raise ValueError("pk_mode=record_key requires key_schema")

    is_tombstone = F.col("value").isNull()
    op_from_value = F.col(f"__v.{cfg.op_column}") if cfg.op_column in [
        f.name for f in value_schema.fields
    ] else F.lit("u")
    op = F.when(is_tombstone, F.lit(cfg.op_delete_value)).otherwise(
        op_from_value
    )

    key_fields = set(cfg.pk_fields)
    key_field_names = {f.name for f in key_schema.fields} if key_schema else set()
    named: dict[str, F.Column] = {}
    for f in value_schema.fields:
        if f.name == cfg.op_column:
            continue
        if pk_mode == "record_key" and f.name in key_fields:
            continue
        named[f.name] = F.col(f"__v.{f.name}")
    if pk_mode == "record_key":
        assert key_schema is not None
        for f in key_schema.fields:
            named[f.name] = F.col(f"__k.{f.name}")
    elif key_schema is not None:
        # record_value mode: keys live in the value struct, but a
        # tombstone's value is NULL — fall back to the record key so
        # the delete still routes to the right row
        for name in key_fields & key_field_names:
            if name in named:
                named[name] = F.coalesce(named[name], F.col(f"__k.{name}"))
            else:
                named[name] = F.col(f"__k.{name}")

    cols = [
        F.col("partition").alias(cfg.partition_column),
        F.col("offset").alias(cfg.offset_column),
        op.alias(cfg.op_column),
    ]
    if keep_topic:
        cols.append(F.col("topic"))
    cols.extend(c.alias(n) for n, c in named.items())
    return out.select(*cols)
