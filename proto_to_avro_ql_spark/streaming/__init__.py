from proto_to_avro_ql_spark.streaming.events import (
    stream_events,
    stream_tumbling_window_agg,
)

__all__ = ["stream_events", "stream_tumbling_window_agg"]
