"""Cascading (medallion) incremental materialization: tail an
upstream lake table's change feed and MERGE-apply it into a
downstream table, exactly-once, keyed by upstream commit version.

This composes two halves the engine already has — the change data
feed (:func:`..lake.changes.table_changes`) as an incremental SOURCE
and :class:`..apply.CdcApplier` as the SINK — into the bronze →
silver → gold pipeline shape: the downstream table is itself a lake
table written through the managed apply path, so a further cascade
can tail IT in turn. The reference stops at one hop (Kafka →
database, ``JdbcSinkTask.put``); chaining is what a lake-native
engine adds on top.

Exactly-once: the upstream commit VERSION is the downstream batch id
under a per-edge source id (``cascade:<upstream path>``), so the
existing batch watermark makes ``sync()`` idempotent — a replayed or
crashed-and-retried sync of the same upstream window skips, and a
partial failure before the downstream commit retries from the same
watermark. The cost of a sync follows the upstream CHANGE volume
(the feed's fast path keeps it batch-sized for delta commits), never
the table size — the property that makes a 100-TB silver table
maintainable per ingest batch.

Filter semantics (incremental view maintenance): ``row_filter`` is a
predicate over upstream rows. An upstream update can move a row INTO
the filter (downstream insert) or OUT of it (downstream DELETE — the
naive "apply the filter to the change rows" silently strands such
rows downstream forever). ``sync`` therefore maps change rows to
ops first: upstream delete OR post-image failing the filter → ``d``,
else ``u``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import BatchResult, CdcApplier
from kafka_jdbc_sink_connector_spark.lake.changes import (
    CHANGE_TYPE,
    FROM_VERSION,
    TO_VERSION,
    table_changes,
)
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

_FEED_META = (CHANGE_TYPE, FROM_VERSION, TO_VERSION)


@dataclass
class CascadeResult:
    mode: str  # bootstrap | incremental | refresh | noop
    upstream_version: int
    from_version: int | None = None
    batch: BatchResult | None = None


class CascadeRunner:
    """One edge of a table-to-table pipeline.

    Parameters
    ----------
    applier:
        The downstream :class:`CdcApplier` (its ``SinkConfig`` decides
        pk, delete mode, buckets for the silver table). Its
        ``pk_fields`` must exist on the upstream rows (after
        ``transform``).
    row_filter:
        Optional predicate :class:`Column` (or SQL string) over
        upstream payload rows — rows failing it are absent downstream,
        maintained incrementally (see module docstring).
    transform:
        Optional PROJECTION-ONLY callable ``DataFrame -> DataFrame``
        applied to upstream rows before the downstream merge: rename /
        derive / drop non-key columns. It must preserve the downstream
        pk columns and must not drop rows — row-level selection
        belongs in ``row_filter``, where delete propagation is
        handled.
    upstream_deleted_when:
        Optional predicate identifying LOGICALLY deleted upstream rows
        — for a soft-delete upstream (``delete.mode=update``), e.g.
        ``F.col("op_type") == "D"``. Matching rows are treated as
        deletes: excluded from bootstrap/refresh and propagated as
        downstream delete events incrementally (the downstream's own
        delete mode then decides soft vs hard). Without it a
        soft-delete upstream's marker column is just another payload
        column — which the downstream merge overwrites with its OWN
        marker, silently resurrecting soft-deleted rows.
    """

    def __init__(
        self,
        spark: SparkSession,
        upstream_path: str,
        applier: CdcApplier,
        *,
        row_filter: Column | str | None = None,
        transform=None,
        upstream_deleted_when: Column | str | None = None,
        source_id: str | None = None,
    ):
        self.spark = spark
        self.upstream_path = upstream_path
        self.applier = applier
        self.row_filter = (
            F.expr(row_filter) if isinstance(row_filter, str) else row_filter
        )
        self.transform = transform
        self.upstream_deleted_when = (
            F.expr(upstream_deleted_when)
            if isinstance(upstream_deleted_when, str)
            else upstream_deleted_when
        )
        self.source_id = source_id or (
            f"cascade:{os.path.abspath(upstream_path)}"
        )

    # -- state ---------------------------------------------------------

    def watermark(self) -> int:
        """Last upstream version applied downstream (-1 = never)."""
        t = self.applier.table()
        return -1 if t is None else t.applied_batch(self.source_id)

    # -- sync ----------------------------------------------------------

    def sync(self, full_refresh: bool = False) -> CascadeResult:
        """Bring the downstream table up to the upstream head.

        * first run (no watermark): bootstrap — full upstream state as
          upserts;
        * afterwards: incremental — the change feed over
          ``(watermark, head]`` only;
        * ``full_refresh=True``: reconcile against the full upstream
          state (upserts for live rows + deletes for downstream keys
          no longer present) — the recovery path when the watermarked
          upstream version was vacuumed and the feed window is gone.
        """
        up = LakeTable.load(self.spark, self.upstream_path)
        head = up.version
        w = self.watermark()
        if head <= w:
            return CascadeResult(mode="noop", upstream_version=head,
                                 from_version=w)
        if w < 0:
            events, mode = self._bootstrap_events(up, head), "bootstrap"
        elif full_refresh:
            events, mode = self._refresh_events(up, head), "refresh"
        else:
            # the incremental feed is a computed pipeline (change-file
            # resolution), change-window-sized: a lazy localCheckpoint
            # stops the applier's stats and merge jobs each re-running
            # it. Bootstrap/refresh stay unpersisted — they are
            # table-sized projections of a plain parquet read, cheap
            # to re-scan and fatal to materialize at 100 TB.
            events, mode = self._incremental_events(up, w, head) \
                .localCheckpoint(eager=False), "incremental"
        res = self.applier.apply_batch(
            events, batch_id=head, source_id=self.source_id
        )
        return CascadeResult(mode=mode, upstream_version=head,
                             from_version=w, batch=res)

    # -- event construction ---------------------------------------------

    def _op_upsert(self) -> str:
        """A non-delete op drawn from the DOWNSTREAM config's
        vocabulary — hardcoding ``'u'`` quarantines every cascaded row
        when the sink uses a custom vocabulary (``error_expr`` checks
        membership), or worse applies upstream deletes as upserts if
        ``'d'`` happens to be a configured update value."""
        cfg = self.applier.cfg
        return (
            cfg.op_update_values[0]
            if cfg.op_update_values
            else cfg.op_insert_value
        )

    def _finish(self, rows: DataFrame, op, apply_transform=True) -> DataFrame:
        """Project + stamp the transport columns the applier expects.

        Offsets are a deterministic hash of the downstream pk — the
        feed emits at most one change per key per window, so collapse
        order within the batch is immaterial; determinism keeps a
        crash-retried sync byte-identical.
        """
        cfg = self.applier.cfg
        rows = rows.withColumn(cfg.op_column, op)
        if apply_transform and self.transform is not None:
            rows = self.transform(rows)
            required = {cfg.op_column, *cfg.pk_fields}
            missing = required - set(rows.columns)
            if missing:
                raise ValueError(
                    f"cascade transform dropped required column(s) "
                    f"{sorted(missing)}; transforms must preserve the "
                    f"downstream pk and the {cfg.op_column!r} column"
                )
        keys = [F.col(k) for k in cfg.pk_fields]
        return rows.withColumn(
            cfg.offset_column, F.xxhash64(*keys)
        ).withColumn(
            cfg.partition_column,
            F.pmod(F.xxhash64(*keys, F.lit(1)), F.lit(1024)).cast("int"),
        )

    def _live(self, rows: DataFrame) -> DataFrame:
        """Upstream rows belonging to the downstream view."""
        if self.upstream_deleted_when is not None:
            rows = rows.filter(
                ~F.coalesce(self.upstream_deleted_when, F.lit(False))
            )
        if self.row_filter is not None:
            rows = rows.filter(self.row_filter)
        return rows

    def _bootstrap_events(self, up: LakeTable, head: int) -> DataFrame:
        return self._finish(
            self._live(up.read(version=head)), F.lit(self._op_upsert())
        )

    def _incremental_events(
        self, up: LakeTable, w: int, head: int
    ) -> DataFrame:
        ch = table_changes(up, w, head)
        is_del = F.col(CHANGE_TYPE) == F.lit("delete")
        if self.upstream_deleted_when is not None:
            # a soft-delete upstream's logical deletes arrive as
            # change_type=update with the marker set — propagate them
            # as downstream deletes
            is_del = is_del | F.coalesce(
                self.upstream_deleted_when, F.lit(False)
            )
        if self.row_filter is not None:
            # post-images failing the filter leave the downstream view;
            # NULL-valued predicates count as failing (bootstrap's
            # .filter drops them), so coalesce before negating
            is_del = is_del | ~F.coalesce(self.row_filter, F.lit(False))
        cfg = self.applier.cfg
        op = F.when(is_del, F.lit(cfg.op_delete_value)).otherwise(
            F.lit(self._op_upsert())
        )
        # stamp the op while the feed meta is still in scope, THEN drop
        ch = ch.withColumn(cfg.op_column, op).drop(*_FEED_META)
        return self._finish(ch, F.col(cfg.op_column))

    def _refresh_events(self, up: LakeTable, head: int) -> DataFrame:
        cfg = self.applier.cfg
        rows = self._live(up.read(version=head))
        # transform runs on the live rows, so the key comparison below
        # happens in DOWNSTREAM key space (a transform may derive keys)
        live = self._finish(rows, F.lit(self._op_upsert()))
        # keys present downstream but gone upstream → explicit deletes
        # (LEFT ANTI on pk; both sides pruned to key columns, so the
        # reconcile shuffles keys, not payloads)
        want_keys = live.select(*cfg.pk_fields).distinct()
        gone_keys = self.applier.read_target().select(*cfg.pk_fields).join(
            want_keys, on=list(cfg.pk_fields), how="left_anti"
        )
        dels = self._finish(
            gone_keys, F.lit(cfg.op_delete_value), apply_transform=False
        )
        return live.unionByName(dels, allowMissingColumns=True)
