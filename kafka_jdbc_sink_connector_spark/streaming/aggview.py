"""Incrementally-maintained aggregate views: a GROUP-BY materialized
view over an upstream lake table, kept current per upstream commit —
the aggregation sibling of :class:`.cascade.CascadeRunner`'s
row-level mirror.

The naive way to keep ``SELECT g, agg(...) GROUP BY g`` current is to
recompute it per batch — table-sized, dead at 100 TB. Pure delta
maintenance (add the inserts, subtract the deletes) only works for
self-inverse aggregates (sum/count) and breaks on min/max under
deletes. This runner takes the production middle road, **group-wise
partial recompute**:

1. the change feed over ``(watermark, head]`` — with PRE-images
   (:func:`..lake.changes.table_changes` ``include_preimages=True``)
   — names every group a change row touches. The pre-image matters:
   an update that MOVES a row between groups must debit the old
   group, which the post-image alone cannot name;
2. only those groups are re-aggregated from the upstream head — a
   broadcast LEFT SEMI join of the (batch-sized) affected-group set
   against the upstream scan, so cost follows the changed groups'
   data, never the table;
3. refreshed groups merge into the downstream table as upserts;
   affected groups with no remaining (post-filter) rows become
   deletes. The downstream is an ordinary lake table written through
   :class:`..apply.CdcApplier` (pk = the group-by columns), so it is
   itself time-travelable, cascade-able, and exactly-once under the
   upstream-version watermark — a crash-retried ``sync`` skips or
   replays idempotently exactly like the row-level cascade.

Because step 2 recomputes from real rows, ANY Spark aggregate
expression is supported — count/sum/avg/min/max/count_distinct/
collect_set — with none of delta-IVM's invertibility restrictions.

Reference anchor: the reference ends at row delivery
(``JdbcSinkTask.put``); maintained aggregates are lake-native
downstream machinery built on the engine's own feed + apply halves.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import BatchResult, CdcApplier
from kafka_jdbc_sink_connector_spark.lake.changes import table_changes
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable
from kafka_jdbc_sink_connector_spark.streaming.cascade import CascadeResult


class AggViewRunner:
    """One maintained aggregate view.

    Parameters
    ----------
    applier:
        Downstream :class:`CdcApplier`; its ``pk_fields`` must equal
        ``group_by`` (the group IS the key of the view).
    group_by:
        Grouping columns (must exist upstream and be non-null for
        grouped rows — the view's primary key cannot be null; rows
        with a NULL group key are excluded from the view, as the
        validator would quarantine their aggregate row anyway).
    aggs:
        ``{output_column: aggregate Column}`` — any Spark aggregate
        expression; evaluated per affected group over the upstream
        head, so no invertibility requirement.
    row_filter:
        Optional predicate over upstream rows (same IVM semantics as
        the row cascade: rows failing it simply don't contribute, and
        a group whose rows all leave the filter is deleted from the
        view; NULL predicate counts as failing).
    """

    def __init__(
        self,
        spark: SparkSession,
        upstream_path: str,
        applier: CdcApplier,
        group_by: list[str],
        aggs: dict[str, Column],
        *,
        row_filter: Column | str | None = None,
        transform=None,
        source_id: str | None = None,
    ):
        if not group_by or not aggs:
            raise ValueError("group_by and aggs must be non-empty")
        if set(applier.cfg.pk_fields) != set(group_by):
            raise ValueError(
                f"downstream pk {list(applier.cfg.pk_fields)} must equal "
                f"group_by {list(group_by)} — the group is the view's key"
            )
        overlap = set(aggs) & set(group_by)
        if overlap:
            raise ValueError(
                f"agg output(s) {sorted(overlap)} collide with group_by"
            )
        from kafka_jdbc_sink_connector_spark.config import DeleteMode

        if applier.cfg.delete_mode is not DeleteMode.DELETE:
            # soft deletes would only mark emptied groups, and
            # read_target() consumers see the marker column as just
            # another column — vanished groups would keep reporting
            # stale aggregates. Hard deletes are the view's contract.
            raise ValueError(
                "aggregate-view applier must use delete_mode='delete' "
                f"(got {applier.cfg.delete_mode.value!r}): emptied "
                "groups must leave the view, not be soft-marked"
            )
        self.spark = spark
        self.upstream_path = upstream_path
        self.applier = applier
        self.group_by = list(group_by)
        self.aggs = dict(aggs)
        self.row_filter = (
            F.expr(row_filter) if isinstance(row_filter, str) else row_filter
        )
        #: optional PROJECTION-ONLY callable run on upstream rows
        #: (feed rows included) before grouping — how DERIVED group
        #: columns work, e.g. a time bucket
        #: ``df.withColumn("hour", date_trunc('hour', ts))`` turns
        #: the view into a Timescale-style continuous aggregate. Must
        #: be deterministic and must not drop rows (row selection
        #: belongs in ``row_filter``): pre-images re-derive the OLD
        #: group through the same expression.
        self.transform = transform
        self.source_id = source_id or (
            f"aggview:{os.path.abspath(upstream_path)}"
        )

    # -- state ---------------------------------------------------------

    def watermark(self) -> int:
        t = self.applier.table()
        return -1 if t is None else t.applied_batch(self.source_id)

    # -- sync ----------------------------------------------------------

    def sync(self, full_refresh: bool = False) -> CascadeResult:
        """Bring the view up to the upstream head: bootstrap (full
        aggregate) on first run, group-wise partial recompute after,
        ``full_refresh=True`` to reconcile after a vacuumed feed
        window (recompute all groups + anti-join deletes)."""
        up = LakeTable.load(self.spark, self.upstream_path)
        head = up.version
        w = self.watermark()
        if head <= w:
            return CascadeResult(mode="noop", upstream_version=head,
                                 from_version=w)
        if w < 0 or full_refresh:
            fresh = self._aggregate(self._live(up.read(version=head)))
            dels = self._gone_groups(fresh) if full_refresh else None
            mode = "refresh" if full_refresh else "bootstrap"
        else:
            feed = table_changes(up, w, head, include_preimages=True)
            if self.transform is not None:
                feed = self.transform(feed)
            # NULL-group images are rows outside the view (same rule
            # as _live): they can't name an affected group
            affected = (
                feed.select(*self.group_by)
                .na.drop(subset=self.group_by)
                .distinct()
                .localCheckpoint(eager=False)
            )
            live = self._live(up.read(version=head))
            relevant = live.join(
                F.broadcast(affected), self.group_by, "left_semi"
            )
            fresh = self._aggregate(relevant)
            # affected groups with no surviving rows leave the view
            dels = affected.join(
                fresh.select(*self.group_by), self.group_by, "left_anti"
            )
            mode = "incremental"
        # the batch frame is a computed pipeline (feed + broadcast
        # semi-join + re-aggregation), not a parquet-backed scan: the
        # applier's stats and merge jobs would each re-execute the
        # whole pipeline. Cut the recompute with a lazy localCheckpoint
        # (materializes with the stats job, reused by the merge) — the
        # frame is group-count-sized for the affected groups, i.e.
        # batch-bounded in the incremental path and view-sized at
        # worst on bootstrap/refresh (disk-backed storage level, the
        # same order as the view table the apply writes anyway).
        events = self._events(fresh, dels).localCheckpoint(eager=False)
        res = self.applier.apply_batch(
            events, batch_id=head, source_id=self.source_id
        )
        return CascadeResult(mode=mode, upstream_version=head,
                             from_version=w, batch=res)

    # -- pieces --------------------------------------------------------

    def _live(self, rows: DataFrame) -> DataFrame:
        if self.transform is not None:
            rows = self.transform(rows)
            missing = set(self.group_by) - set(rows.columns)
            if missing:
                raise ValueError(
                    f"aggview transform dropped group column(s) "
                    f"{sorted(missing)}"
                )
        rows = rows.na.drop(subset=self.group_by)
        if self.row_filter is not None:
            rows = rows.filter(
                F.coalesce(self.row_filter, F.lit(False))
            )
        return rows

    def _aggregate(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.group_by).agg(
            *[c.alias(name) for name, c in self.aggs.items()]
        )

    def _gone_groups(self, fresh: DataFrame) -> DataFrame | None:
        t = self.applier.table()
        if t is None:
            return None
        return t.read().select(*self.group_by).join(
            fresh.select(*self.group_by), self.group_by, "left_anti"
        )

    def _events(
        self, fresh: DataFrame, dels: DataFrame | None
    ) -> DataFrame:
        cfg = self.applier.cfg
        up_op = (
            cfg.op_update_values[0]
            if cfg.op_update_values
            else cfg.op_insert_value
        )
        ev = fresh.withColumn(cfg.op_column, F.lit(up_op))
        if dels is not None:
            ev = ev.unionByName(
                dels.withColumn(
                    cfg.op_column, F.lit(cfg.op_delete_value)
                ),
                allowMissingColumns=True,
            )
        keys = [F.col(k) for k in self.group_by]
        # deterministic transport columns (hash of the group key):
        # the feed emits one state per group per window, so collapse
        # order is immaterial; determinism keeps crash replays
        # byte-identical — same scheme as the row cascade
        return ev.withColumn(
            cfg.offset_column, F.xxhash64(*keys)
        ).withColumn(
            cfg.partition_column,
            F.pmod(F.xxhash64(*keys, F.lit(1)), F.lit(1024)).cast("int"),
        )
