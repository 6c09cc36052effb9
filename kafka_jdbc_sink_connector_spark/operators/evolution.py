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
types; incompatible records would fail and dead-letter) — unless
``auto_evolve_widen`` is on, in which case SAFE widenings (int chain,
float→double, decimal precision at equal scale) alter the TARGET
column type instead of quarantining unrepresentable values; see
:func:`widen_for_batch`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


#: atomic types a per-row try_cast can attempt between; complex-type
#: mismatches (array/map/struct) have no row-level rescue.
_ATOMIC = (
    T.StringType, T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
    T.LongType, T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
    T.TimestampType, T.TimestampNTZType, T.BinaryType,
)


def coerce_for_target(
    target: T.StructType, events: DataFrame, cfg: SinkConfig
) -> tuple[dict[str, "F.Column"], "F.Column | None"]:
    """Per-record type rescue (reference O18 second half:
    ``JdbcAuditSinkTask.unrollAndRetry``, ``JdbcAuditSinkTask.java:123-140``
    dead-letters individually failing records and applies the rest).

    For each payload column whose batch type differs from the target's,
    returns a ``try_cast`` replacement plus an error expression that
    fires on rows whose value cannot be represented in the target type
    (non-null in, null out). Those rows quarantine with a reason while
    the rest of the batch applies — instead of poisoning the whole
    batch the way a blanket :class:`SchemaEvolutionError` would.

    Complex-type mismatches (array vs int, …) have no row-level cast;
    every row with a non-null value quarantines and the column reads
    as NULL for the survivors.
    """
    by_name = {f.name: f for f in target.fields}
    payload = event_payload_schema(events, cfg)
    casts: dict[str, F.Column] = {}
    errors: list[F.Column] = []
    for f in payload.fields:
        t = by_name.get(f.name)
        if t is None or t.dataType == f.dataType:
            continue
        if f.name in cfg.pk_fields:
            # a mistyped key can't be partially rescued: matching
            # against the target key would be undefined
            raise SchemaEvolutionError(
                f"key column {f.name}: incompatible type change "
                f"{t.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()}"
            )
        src, dst = f.dataType, t.dataType
        reason = (
            f"cast failed: {f.name} "
            f"{src.simpleString()} -> {dst.simpleString()}"
        )
        if isinstance(src, _ATOMIC) and isinstance(dst, _ATOMIC):
            c = F.col(f.name).try_cast(dst)
            casts[f.name] = c
            errors.append(
                F.when(F.col(f.name).isNotNull() & c.isNull(),
                       F.lit(reason))
            )
        else:
            casts[f.name] = F.lit(None).cast(dst)
            errors.append(
                F.when(F.col(f.name).isNotNull(), F.lit(reason))
            )
    err = F.coalesce(*errors) if errors else None
    return casts, err


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


#: integer widening chain — each type reads losslessly as any later one
_INT_RANK = {T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2,
             T.LongType(): 3}


def _is_safe_widening(src: T.DataType, dst: T.DataType) -> bool:
    """True when every value of ``src`` is exactly representable in
    ``dst`` AND Spark's parquet reader up-converts ``src``-typed files
    under a ``dst`` read schema (probed on this Spark version for the
    vectorized and row-based readers, top-level and nested): the
    integer chain, float→double, and decimal precision growth at equal
    scale. Deliberately excluded: int→float/double (precision loss
    past 2^24/2^53), string widenings, date/timestamp (timezone
    semantics), anything complex."""
    if isinstance(src, tuple(type(t) for t in _INT_RANK)) and isinstance(
        dst, tuple(type(t) for t in _INT_RANK)
    ):
        return _INT_RANK[src] < _INT_RANK[dst]
    if isinstance(src, T.FloatType) and isinstance(dst, T.DoubleType):
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return dst.scale == src.scale and dst.precision > src.precision
    return False


def widen_for_batch(
    table: LakeTable, events: DataFrame, cfg: SinkConfig,
    source_id: str | None = None, batch_id: int | None = None,
) -> list[str]:
    """Widen TARGET column types to the batch's where the change is a
    safe widening (``auto_evolve_widen``) — beyond reference parity
    (the reference only auto-ADDS columns,
    ``DbStructure.createOrAmendIfNecessary``): an upstream ALTER from
    int to bigint otherwise strands every out-of-int-range value in
    quarantine forever.

    Metadata-only commit, same as column adds: existing parquet (base,
    delta, sdel) files need no rewrite — the explicit read schema
    up-converts them (probed; see :func:`_is_safe_widening`). The
    commit's stats carry the ``evolved``/``evolved_by`` tags so a
    replayed batch pins its historical (narrow) schema exactly like it
    does across column-add commits.

    Key columns never widen: the bucket layout hashes the first pk
    field and Spark's hash is type-sensitive — a widened key would
    silently re-bucket the table. Mistyped keys keep raising
    :class:`SchemaEvolutionError` (coerce_for_target).

    Returns ``["col: int->bigint", ...]`` (empty = nothing widened).
    """
    payload = event_payload_schema(events, cfg)
    by_name = {f.name: f for f in payload.fields}
    changed: list[str] = []
    fields: list[T.StructField] = []
    for f in table.schema.fields:
        p = by_name.get(f.name)
        if (
            p is not None
            and p.dataType != f.dataType
            and f.name not in cfg.pk_fields
            and _is_safe_widening(f.dataType, p.dataType)
        ):
            fields.append(T.StructField(f.name, p.dataType, f.nullable))
            changed.append(
                f"{f.name}: {f.dataType.simpleString()}->"
                f"{p.dataType.simpleString()}"
            )
        else:
            fields.append(f)
    if not changed:
        return []
    stats: dict = {
        # the 'evolved' key is what the replay schema pin walks past
        # (apply._committing_snapshot); 'widened' records the detail
        "evolved": [c.split(":", 1)[0] for c in changed],
        "widened": changed,
    }
    if source_id is not None and batch_id is not None:
        stats["evolved_by"] = [source_id, batch_id]
    table.commit_metadata(T.StructType(fields), stats=stats)
    return changed


def evolve_for_batch(
    table: LakeTable, events: DataFrame, cfg: SinkConfig,
    source_id: str | None = None, batch_id: int | None = None,
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
    if cfg.fields_whitelist is not None:
        # the reference amends only whitelisted fields
        # (FieldsMetadata.extract with fields.whitelist,
        # BufferedRecords.java:189); evolving non-whitelisted columns
        # would add permanently-NULL dead weight to the target
        allowed = set(cfg.fields_whitelist)
        missing = [f for f in missing if f.name in allowed]
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
    # the (source_id, batch_id) tag lets a replay tell THIS batch's
    # evolution commit apart from another source's that happens to sit
    # immediately below the merge commit in a multi-source table — the
    # schema pin in apply._committing_snapshot only steps past commits
    # this batch produced
    stats: dict = {"evolved": [f.name for f in missing]}
    if source_id is not None and batch_id is not None:
        stats["evolved_by"] = [source_id, batch_id]
    table.commit_metadata(new_schema, stats=stats)
    return [f.name for f in missing]
