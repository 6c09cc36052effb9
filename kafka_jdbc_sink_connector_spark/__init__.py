"""PySpark-native CDC ingest engine.

A brand-new engine with the capabilities of the reference
``BNHTech/kafka-jdbc-sink-connector`` (a Kafka Connect JDBC audit sink,
see SURVEY.md): it consumes Debezium/GoldenGate-style change events
(insert / update / delete), deduplicates them per composite key with
last-writer-wins ordering by source offset, and MERGE-applies them into
an ACID snapshot-versioned lake table (bucketed parquet + atomic manifest
log) with upsert, soft-delete ("delete as update"), hard-delete,
audit-timestamp injection, auto schema evolution, exactly-once
``foreachBatch`` commits and per-partition lineage.

Everything is expressed Spark-first: DataFrame/SQL transformations that
Catalyst can optimize (partial aggregation for the dedup, broadcast or
shuffle joins for the merge, parquet predicate pushdown + bucket pruning
for the target scan). No per-row Python in the hot path.
"""

from kafka_jdbc_sink_connector_spark.config import (
    DeleteMode,
    InsertMode,
    SinkConfig,
)
from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

__version__ = "0.1.0"

__all__ = [
    "CdcApplier",
    "DeleteMode",
    "InsertMode",
    "LakeTable",
    "SinkConfig",
    "__version__",
]
