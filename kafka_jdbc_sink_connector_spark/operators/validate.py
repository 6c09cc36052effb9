"""Record validation + quarantine split (reference O2 / O18).

The reference validates each record (inherited ``RecordValidator``,
called at ``BufferedRecords.java:168``) and, after retries are
exhausted, replays failing batches record-by-record into a dead-letter
reporter (``JdbcAuditSinkTask.unrollAndRetry``,
``JdbcAuditSinkTask.java:123-140``). Distributed equivalent: a single
declarative pass computes a per-row ``error`` reason; rows with one go
to a quarantine table with their source coordinates, the rest continue.
No per-row replay is needed because the columnar apply is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.config import SinkConfig


class MissingRetainFieldError(ValueError):
    """A configured soft-delete retain field is absent from both the
    event schema and the target schema (mirrors the hard error at
    ``BufferedRecords.java:70-73``)."""


VALID_OPS_DEFAULT = ("c", "u", "d", "r")  # r = snapshot read (Debezium)


def check_retain_fields(
    cfg: SinkConfig, event_cols: list[str], target_cols: list[str]
) -> None:
    known = set(event_cols) | set(target_cols)
    for f in cfg.delete_retain_fields:
        if f not in known:
            raise MissingRetainFieldError(
                f"delete retain field {f!r} does not exist in the event "
                f"or target schema (delete_retain_fields="
                f"{list(cfg.delete_retain_fields)})"
            )


def error_expr(cfg: SinkConfig, columns: list[str]):
    """First-match error reason per row, NULL when valid.

    Delete events only need their match key (``delete_as_update_key``,
    possibly a pk subset — the reference's tombstone-projected records
    carry only those fields); upserts need the full pk.
    """
    op = F.col(cfg.op_column)
    is_del = op == F.lit(cfg.op_delete_value)
    del_keys = set(cfg.delete_as_update_key or cfg.pk_fields)
    checks = []
    for k in cfg.pk_fields:
        required = (
            F.lit(True) if k in del_keys else ~is_del
        )
        if k in columns:
            checks.append(
                F.when(
                    required & F.col(k).isNull(),
                    F.lit(f"null key field {k}"),
                )
            )
        else:
            checks.append(
                F.when(required, F.lit(f"missing key field {k}"))
            )
    checks.append(F.when(op.isNull(), F.lit("null op")))
    # validated against the *configured* vocabulary (insert ∪ update ∪
    # delete ops) so a custom op_delete_value like 'D' — or Kafka
    # tombstones, which are assigned op=op_delete_value — passes
    checks.append(
        F.when(~op.isin(*cfg.valid_ops), F.concat(F.lit("unknown op "), op))
    )
    checks.append(
        F.when(F.col(cfg.offset_column).isNull(), F.lit("null offset"))
    )
    return F.coalesce(*checks)


def validate_split(
    events: DataFrame, cfg: SinkConfig, batch_id: int = -1
) -> tuple[DataFrame, DataFrame]:
    """→ (valid events, quarantine rows in F4 shape)."""
    tagged = events.withColumn("__error", error_expr(cfg, events.columns))
    valid = tagged.filter(F.col("__error").isNull()).drop("__error")
    part = (
        F.col(cfg.partition_column).cast("int")
        if cfg.partition_column in events.columns
        else F.lit(None).cast(T.IntegerType())
    )
    off = (
        F.col(cfg.offset_column).cast("long")
        if cfg.offset_column in events.columns
        else F.lit(None).cast(T.LongType())
    )
    quarantine = tagged.filter(F.col("__error").isNotNull()).select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("raw"),
        F.col("__error").alias("error"),
        part.alias("kafka_partition"),
        off.alias("kafka_offset"),
        F.lit(batch_id).cast("long").alias("batch_id"),
    )
    return valid, quarantine
