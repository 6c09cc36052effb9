"""Auto schema evolution (reference O6: flush-on-schema-change +
``DbStructure.createOrAmendIfNecessary``, ``BufferedRecords.java:176-195``).

The reference flushes its buffer at every schema transition and ALTERs
the destination table to add new optional columns
(``BufferedRecordsTest.java:64-88``: schema B adds optional ``age``).
Here a micro-batch may *straddle* evolution steps, so instead of
segmenting, the engine:

1. diffs the batch's event columns against the table schema,
2. appends any new columns as **nullable** via a metadata-only snapshot
   commit (the lake-table analog of ``ALTER TABLE ADD COLUMN``; old
   parquet files need no rewrite — the explicit read schema
   null-backfills them),
3. lets the collapse/merge treat missing columns in older events as
   NULL (``unionByName(allowMissingColumns=True)`` semantics).

Type changes are rejected, as in the reference (it never alters column
types; incompatible records would fail and dead-letter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.config import DeleteMode, SinkConfig
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable
from kafka_jdbc_sink_connector_spark.schemas import (
    CDC_META_COLUMNS,
    missing_nullable_fields,
    schema_compatible,
)


class SchemaEvolutionError(ValueError):
    pass


def event_payload_schema(events: DataFrame, cfg: SinkConfig) -> T.StructType:
    """Payload (non-transport) portion of a change-event DataFrame."""
    drop = set(CDC_META_COLUMNS) | {
        cfg.op_column,
        cfg.offset_column,
        cfg.partition_column,
    }
    return T.StructType([f for f in events.schema.fields if f.name not in drop])


def target_schema_for(payload: T.StructType, cfg: SinkConfig) -> T.StructType:
    """Derive an auto-created target schema from an event payload
    (reference ``auto.create=true``): payload columns, keys non-null,
    plus the engine-managed soft-delete marker and audit column."""
    fields = []
    for f in payload.fields:
        nullable = f.name not in cfg.pk_fields
        fields.append(T.StructField(f.name, f.dataType, nullable))
    names = {f.name for f in fields}
    if cfg.delete_mode is DeleteMode.UPDATE and cfg.soft_delete_column not in names:
        fields.append(T.StructField(cfg.soft_delete_column, T.StringType(), True))
    if cfg.audit_ts_column not in names:
        fields.append(T.StructField(cfg.audit_ts_column, T.TimestampType(), True))
    return T.StructType(fields)


def evolve_for_batch(
    table: LakeTable, events: DataFrame, cfg: SinkConfig
) -> list[str]:
    """Evolve ``table`` to accommodate the batch's columns.

    Returns the list of added column names (empty when no evolution was
    needed). Raises when types conflict or evolution is disabled but
    required (the reference would fail the DDL and dead-letter the
    batch, ``JdbcAuditSinkTask.java:75-81``).
    """
    payload = event_payload_schema(events, cfg)
    problems = schema_compatible(table.schema, payload)
    if problems:
        raise SchemaEvolutionError("; ".join(problems))
    missing = missing_nullable_fields(table.schema, payload)
    if not missing:
        return []
    if not cfg.auto_evolve:
        raise SchemaEvolutionError(
            f"schema evolution required for columns "
            f"{[f.name for f in missing]} but auto_evolve is disabled"
        )
    # keep engine-managed columns (marker, audit) at the tail, mirroring
    # the destination-table convention of the fixtures
    managed = {cfg.audit_ts_column}
    if cfg.delete_mode is DeleteMode.UPDATE:
        managed.add(cfg.soft_delete_column)
    head = [f for f in table.schema.fields if f.name not in managed]
    tail = [f for f in table.schema.fields if f.name in managed]
    new_schema = T.StructType(head + missing + tail)
    table.commit_metadata(
        new_schema, stats={"evolved": [f.name for f in missing]}
    )
    return [f.name for f in missing]
