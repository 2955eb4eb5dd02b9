from proto_to_avro_ql_spark.operators.reports import flagship_report

__all__ = ["flagship_report"]
