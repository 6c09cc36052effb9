from kafka_jdbc_sink_connector_spark.lake.table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
