from proto_to_avro_ql_spark.functions.defaults import (
    apply_leaf_defaults,
    default_for,
    empty_string_to_null,
    enum_symbol,
)

__all__ = ["apply_leaf_defaults", "default_for", "empty_string_to_null", "enum_symbol"]
