from kafka_jdbc_sink_connector_spark.operators.dedup import collapse_last_writer
from kafka_jdbc_sink_connector_spark.operators.validate import validate_split
from kafka_jdbc_sink_connector_spark.operators.merge import merge_into

__all__ = ["collapse_last_writer", "validate_split", "merge_into"]
