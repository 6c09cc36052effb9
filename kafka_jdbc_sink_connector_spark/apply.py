"""Batch-apply orchestrator (the engine's E1 write path, SURVEY.md §3).

``CdcApplier.apply_batch`` is the distributed equivalent of the whole
reference chain ``put → JdbcAuditDbWriter.write → BufferedRecords.flush
→ commit`` (``JdbcAuditSinkTask.java:62-121``,
``JdbcAuditDbWriter.java:63-94``):

1. **exactly-once gate** — skip batch ids already recorded in the table
   snapshot (idempotent ``foreachBatch`` replay),
2. **validate + quarantine** (O2/O18),
3. **auto-create / auto-evolve** the target (O6),
4. **collapse** to last writer per key (replaces O5/O7 ordering),
5. **merge** upserts + soft/hard deletes with audit-ts injection and
   atomic snapshot commit (O8-O16),
6. **lineage** append (per-partition offset ranges + op counts).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

from kafka_jdbc_sink_connector_spark.config import (
    DeleteMode,
    InsertMode,
    SinkConfig,
)
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable
from kafka_jdbc_sink_connector_spark.operators import merge as merge_ops
from kafka_jdbc_sink_connector_spark.operators.dedup import collapse_last_writer
from kafka_jdbc_sink_connector_spark.operators.evolution import (
    evolve_for_batch,
    event_payload_schema,
    target_schema_for,
)
from kafka_jdbc_sink_connector_spark.operators.lineage import lineage_for_batch
from kafka_jdbc_sink_connector_spark.operators.validate import (
    check_retain_fields,
    validate_split,
)


@dataclass
class BatchResult:
    batch_id: int
    skipped: bool = False
    n_events: int = 0
    n_quarantined: int = 0
    snapshot_version: int | None = None
    evolved_columns: list[str] = field(default_factory=list)
    seconds: float = 0.0


class CdcApplier:
    """Applies change-event batches to one destination lake table."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: SinkConfig,
        table_path: str,
        quarantine_path: str | None = None,
        lineage_path: str | None = None,
        audit_ts: Column | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.table_path = table_path
        base = os.path.dirname(table_path.rstrip("/")) or "."
        name = os.path.basename(table_path.rstrip("/"))
        self.quarantine_path = quarantine_path or os.path.join(
            base, f"{name}_quarantine"
        )
        self.lineage_path = lineage_path or os.path.join(
            base, f"{name}_lineage"
        )
        #: fixed audit timestamp for deterministic tests; None = apply time
        self.audit_ts = audit_ts

    # -- target lifecycle --------------------------------------------

    def table(self) -> LakeTable | None:
        if LakeTable.exists(self.table_path):
            return LakeTable.load(self.spark, self.table_path)
        return None

    def ensure_table(self, events: DataFrame) -> LakeTable:
        t = self.table()
        if t is not None:
            return t
        if not self.cfg.auto_create:
            raise FileNotFoundError(
                f"target table {self.table_path} does not exist and "
                f"auto_create is disabled"
            )
        payload = event_payload_schema(events, self.cfg)
        schema = target_schema_for(payload, self.cfg)
        return LakeTable.create(
            self.spark,
            self.table_path,
            schema,
            n_buckets=self.cfg.n_buckets,
            key_fields=self.cfg.pk_fields,
            bucket_key=self.cfg.pk_fields[0],
        )

    # -- apply --------------------------------------------------------

    def apply_batch(
        self,
        events: DataFrame,
        batch_id: int = 0,
        source_id: str = "default",
    ) -> BatchResult:
        t0 = time.monotonic()
        cfg = self.cfg
        table = self.ensure_table(events)
        if batch_id <= table.applied_batch(source_id):
            return BatchResult(batch_id=batch_id, skipped=True,
                               snapshot_version=table.version)

        check_retain_fields(
            cfg, events.columns, [f.name for f in table.schema.fields]
        )
        valid, quarantine = validate_split(events, cfg, batch_id)
        valid = valid.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            evolved = evolve_for_batch(table, valid, cfg)

            n_quarantined = self._append_parquet(
                quarantine, self.quarantine_path
            )

            if cfg.insert_mode is InsertMode.INSERT:
                snap = merge_ops.append_only(
                    table, valid, cfg,
                    audit_ts=self.audit_ts,
                    source_id=source_id, batch_id=batch_id,
                )
            else:
                payload = merge_ops.payload_columns(table.schema, cfg)
                collapsed = collapse_last_writer(valid, cfg, payload)
                snap = merge_ops.merge_into(
                    table, collapsed, cfg,
                    audit_ts=self.audit_ts,
                    source_id=source_id, batch_id=batch_id,
                )

            lineage = lineage_for_batch(
                valid, quarantine, cfg, batch_id, snap.version
            )
            self._append_parquet(lineage, self.lineage_path)
            n_events = valid.count()
        finally:
            valid.unpersist()

        return BatchResult(
            batch_id=batch_id,
            n_events=n_events,
            n_quarantined=n_quarantined,
            snapshot_version=snap.version,
            evolved_columns=evolved,
            seconds=time.monotonic() - t0,
        )

    def read_target(self) -> DataFrame:
        t = self.table()
        if t is None:
            raise FileNotFoundError(self.table_path)
        return t.read()

    def read_lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_path)

    def read_quarantine(self) -> DataFrame:
        return self.spark.read.parquet(self.quarantine_path)

    def _append_parquet(self, df: DataFrame, path: str) -> int:
        """Append rows, returning how many were written (0-row frames
        still create the directory so readers never miss it)."""
        n = df.count()
        df.write.mode("append").parquet(path)
        return n
