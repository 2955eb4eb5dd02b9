from proto_to_avro_ql_spark.sources.io import (
    QueryCache,
    read_table,
    sink_json,
    sink_json_direct,
    write_avro_or_parquet,
)

__all__ = [
    "QueryCache",
    "read_table",
    "sink_json",
    "sink_json_direct",
    "write_avro_or_parquet",
]
