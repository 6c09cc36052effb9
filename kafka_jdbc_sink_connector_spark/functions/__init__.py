from kafka_jdbc_sink_connector_spark.functions.keys import (
    bucket_expr,
    det_unit,
    key_struct,
)

__all__ = ["bucket_expr", "det_unit", "key_struct"]
