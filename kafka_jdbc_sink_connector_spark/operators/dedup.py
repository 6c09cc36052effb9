"""Per-key change-event collapse (last-writer-wins dedup).

Replaces the reference's op-type segmented *ordered* execution
(``BufferedRecords.flushWithDelete``, ``BufferedRecords.java:100-138``):
applying a batch's events in offset order per key produces the same
final row as applying only

* the latest non-delete event (the surviving column values), and
* the latest delete event, iff it is newer than the surviving upsert
  (the row then ends soft-/hard-deleted), or when no upsert exists at
  all (the delete acts against the pre-batch target row).

so the whole batch collapses to ≤1 row per key — which is also the
cardinality Iceberg/Delta MERGE requires of its source, and what makes
replays idempotent.

Scale: implemented as ``groupBy(pk).agg(max_by(...))`` — a declarative
aggregate with **map-side partial aggregation**, so at-least-once
duplicate storms and hot keys are mostly reduced before the shuffle
(a window + ``row_number`` formulation would sort and shuffle every
event). An optional salted two-phase variant splits pathological
single-key floods across ``salt`` reducers first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.config import SinkConfig

UPSERT_STRUCT = "__upsert"
DELETE_STRUCT = "__delete"
UPSERT_OFF = "__upsert_off"
DELETE_OFF = "__delete_off"
EVENT_OP = "__op"


def _agg_exprs(cfg: SinkConfig, payload_struct_col: str | None = None):
    op = F.col(cfg.op_column)
    off = F.col(cfg.offset_column)
    is_del = op == F.lit(cfg.op_delete_value)
    return op, off, is_del


def collapse_last_writer(
    events: DataFrame,
    cfg: SinkConfig,
    payload_cols: list[str],
    salt: int | None = None,
) -> DataFrame:
    """Collapse ``events`` to one row per ``cfg.pk_fields``.

    Output: pk fields + ``__upsert`` (payload struct of the latest
    non-delete event incl. its op, or NULL), ``__delete`` (struct of
    the latest delete event's *retained* fields, or NULL),
    ``__upsert_off`` / ``__delete_off`` (their offsets).

    ``payload_cols`` are the event columns to carry (the target table's
    data columns minus engine-managed marker/audit columns); events
    lacking one (older schema versions) contribute NULL.

    Width matters: the structs exclude the pk fields (they are the
    grouping keys) and the delete struct carries only the soft-delete
    retain fields — the aggregate is sort-based (struct buffers), so
    every byte is sorted and shuffled once.
    """
    salt = cfg.dedup_salt if salt is None else salt
    op = F.col(cfg.op_column)
    off = F.col(cfg.offset_column)
    is_del = op == F.lit(cfg.op_delete_value)

    keys = list(cfg.pk_fields)
    carried = [
        (F.col(c) if c in events.columns else F.lit(None)).alias(c)
        for c in payload_cols
        if c not in keys
    ]
    payload = F.struct(*carried, op.alias(EVENT_OP))
    retained = [
        (F.col(c) if c in events.columns else F.lit(None)).alias(c)
        for c in cfg.delete_retain_fields
        if c not in keys
    ]
    del_payload = F.struct(*retained, op.alias(EVENT_OP))

    aggs = [
        F.max_by(payload, F.when(~is_del, off)).alias(UPSERT_STRUCT),
        F.max(F.when(~is_del, off)).alias(UPSERT_OFF),
        F.max_by(del_payload, F.when(is_del, off)).alias(DELETE_STRUCT),
        F.max(F.when(is_del, off)).alias(DELETE_OFF),
    ]

    if salt and salt > 1:
        # phase 1: spread each key over `salt` reducers; phase 2 merges
        # the per-salt winners. Defeats a single key receiving a large
        # fraction of the batch (hot-conversation flood).
        phase1 = (
            events.groupBy(*keys, F.pmod(off, F.lit(salt)).alias("__salt"))
            .agg(*aggs)
        )
        return phase1.groupBy(*keys).agg(
            F.max_by(F.col(UPSERT_STRUCT), F.col(UPSERT_OFF)).alias(UPSERT_STRUCT),
            F.max(F.col(UPSERT_OFF)).alias(UPSERT_OFF),
            F.max_by(F.col(DELETE_STRUCT), F.col(DELETE_OFF)).alias(DELETE_STRUCT),
            F.max(F.col(DELETE_OFF)).alias(DELETE_OFF),
        )
    return events.groupBy(*keys).agg(*aggs)


def collapse_deletes_by_key(
    events: DataFrame, cfg: SinkConfig
) -> DataFrame:
    """Collapse delete events to one row per ``delete_as_update_key``
    (used when the delete match key is a proper pk *subset* — the
    reference's ``delete.as.update.key=RECID`` with pk [RECID,V_M,V_S]:
    one delete then soft-deletes every row sharing the subset key).

    Output: delete-key fields + ``__delete`` (retain-field struct of
    the latest delete) + ``__delete_off``.
    """
    op = F.col(cfg.op_column)
    off = F.col(cfg.offset_column)
    keys = list(cfg.delete_as_update_key)
    dels = events.filter(op == F.lit(cfg.op_delete_value))
    retained = [
        (F.col(c) if c in events.columns else F.lit(None)).alias(c)
        for c in cfg.delete_retain_fields
        if c not in keys
    ]
    del_payload = F.struct(*retained, op.alias(EVENT_OP))
    return dels.groupBy(*keys).agg(
        F.max_by(del_payload, off).alias(DELETE_STRUCT),
        F.max(off).alias(DELETE_OFF),
    )


def collapse_last_writer_window(
    events: DataFrame, cfg: SinkConfig, payload_cols: list[str]
) -> DataFrame:
    """Window/row_number formulation of the same collapse — kept as a
    cross-check implementation for tests (sorts within key partitions;
    no partial aggregation, so strictly worse at scale than
    :func:`collapse_last_writer`).
    """
    from pyspark.sql import Window as W

    keys = list(cfg.pk_fields)
    off = F.col(cfg.offset_column)
    is_del = F.col(cfg.op_column) == F.lit(cfg.op_delete_value)
    carried = [
        (F.col(c) if c in events.columns else F.lit(None)).alias(c)
        for c in payload_cols
        if c not in keys
    ]
    payload = F.struct(*carried, F.col(cfg.op_column).alias(EVENT_OP))
    retained = [
        (F.col(c) if c in events.columns else F.lit(None)).alias(c)
        for c in cfg.delete_retain_fields
        if c not in keys
    ]
    del_payload = F.struct(*retained, F.col(cfg.op_column).alias(EVENT_OP))
    tagged = events.withColumn("__is_del", is_del)
    w = W.partitionBy(*keys, "__is_del").orderBy(off.desc())
    last = tagged.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    ups = last.filter(~F.col("__is_del")).select(
        *keys,
        payload.alias(UPSERT_STRUCT),
        off.alias(UPSERT_OFF),
    )
    dels = last.filter(F.col("__is_del")).select(
        *keys,
        del_payload.alias(DELETE_STRUCT),
        off.alias(DELETE_OFF),
    )
    return ups.join(dels, keys, "full_outer")
