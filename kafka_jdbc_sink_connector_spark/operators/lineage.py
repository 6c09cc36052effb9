"""Per-batch, per-source-partition lineage metrics (FIXTURES.md F5).

The reference exposes no metrics beyond logs; the north rule requires
per-partition lineage (source offset ranges, applied-op counts) and
throughput accounting, so the engine computes them in one small
aggregation per micro-batch over the already-validated events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.config import SinkConfig


def lineage_for_batch(
    valid: DataFrame,
    quarantine: DataFrame,
    cfg: SinkConfig,
    batch_id: int,
    snapshot_version: int | None = None,
) -> DataFrame:
    op = F.col(cfg.op_column)
    part = cfg.partition_column
    off = F.col(cfg.offset_column)
    agg = valid.groupBy(F.col(part).cast("int").alias("kafka_partition")).agg(
        F.min(off).cast("long").alias("min_offset"),
        F.max(off).cast("long").alias("max_offset"),
        F.sum(F.when(op == cfg.op_insert_value, 1).otherwise(0)).alias(
            "n_insert"
        ),
        # any valid non-delete, non-insert op counts as update, so
        # custom (non-Debezium) vocabularies classify correctly
        F.sum(
            F.when(
                (op != cfg.op_insert_value) & (op != cfg.op_delete_value),
                1,
            ).otherwise(0)
        ).alias("n_update"),
        F.sum(
            F.when(op == cfg.op_delete_value, 1).otherwise(0)
        ).alias("n_delete"),
    )
    q = quarantine.groupBy(
        F.col("kafka_partition").cast("int").alias("kafka_partition")
    ).agg(F.count(F.lit(1)).alias("n_quarantined"))
    out = (
        agg.join(q, "kafka_partition", "full_outer")
        .select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "kafka_partition",
            "min_offset",
            "max_offset",
            F.coalesce("n_insert", F.lit(0)).cast("long").alias("n_insert"),
            F.coalesce("n_update", F.lit(0)).cast("long").alias("n_update"),
            F.coalesce("n_delete", F.lit(0)).cast("long").alias("n_delete"),
            F.coalesce("n_quarantined", F.lit(0))
            .cast("long")
            .alias("n_quarantined"),
            F.lit(snapshot_version).cast("long").alias("snapshot_version"),
        )
    )
    return out
