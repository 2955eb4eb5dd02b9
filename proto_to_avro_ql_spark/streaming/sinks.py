"""Streaming sinks beyond the memory demo: foreachBatch with an
idempotent overwrite-by-partition parquet write — the exactly-once
recipe without a transactional table format.

Each micro-batch's aggregates are written with dynamic partition
overwrite: re-processing a batch after a crash rewrites the same
partitions with the same content instead of duplicating rows. This is
the pattern the incremental layer (sources/incremental.py) pairs with.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.streaming.events import stream_events


def windowed_agg(ev: DataFrame, duration: str = "1 hour") -> DataFrame:
    w = F.window("ts", duration)
    return (
        ev.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd-HH").alias("window_part"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_partitioned_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint: str,
    duration: str = "1 hour",
) -> None:
    """availableNow streaming run writing per-window partitions
    idempotently via foreachBatch."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    ev = stream_events(spark, sf_dir).withWatermark("ts", "2 hours")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        agg = windowed_agg(batch_df, duration)
        # dynamic overwrite: only partitions present in this batch are
        # replaced — a replayed batch converges to the same state.
        agg.write.mode("overwrite").partitionBy("window_part").parquet(out_path)

    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def read_partitioned_output(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(out_path)
