"""Streaming/batch consistency: the Structured Streaming tumbling-window
agg must produce exactly the batch operator's result (Kappa check)."""

from __future__ import annotations

from proto_to_avro_ql_spark.operators.windows import tumbling_window_agg
from proto_to_avro_ql_spark.sources.io import read_table
from proto_to_avro_ql_spark.streaming.events import run_stream_to_memory


class TestStreamingWindowAgg:
    def test_stream_equals_batch(self, spark, sf_dir):
        batch = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value, r.avg_value)
            for r in tumbling_window_agg(read_table(spark, sf_dir, "events")).collect()
        }
        streamed = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value, r.avg_value)
            for r in run_stream_to_memory(spark, sf_dir).collect()
        }
        assert streamed == batch
        assert len(batch) > 0


class TestStatefulSessionize:
    def test_stream_sessionize_equals_batch(self, spark, sf_dir):
        """applyInPandasWithState sessionization must reproduce the
        batch window-function sessionization exactly."""
        import shutil

        from proto_to_avro_ql_spark.operators.windows import sessionize
        from proto_to_avro_ql_spark.streaming.sessionize import (
            run_stream_sessionize_to_memory,
        )

        shutil.rmtree("/tmp/ckpt_t_sessions", ignore_errors=True)
        streamed = {
            (r.user_id, r.event_id): r.session_seq
            for r in run_stream_sessionize_to_memory(
                spark, sf_dir, table_name="t_sessions"
            ).collect()
        }
        batch = {
            (r.user_id, r.event_id): r.session_seq
            for r in sessionize(read_table(spark, sf_dir, "events"), 30).collect()
        }
        assert len(streamed) == len(batch) > 0
        assert streamed == batch
