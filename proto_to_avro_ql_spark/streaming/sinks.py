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


def run_stream_append_parquet(
    spark: SparkSession,
    sf_dir: str,
    staging: str,
    out_path: str,
    checkpoint: str,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    n_files: int = 4,
) -> DataFrame:
    """Native parquet file sink in APPEND output mode: each window row
    is emitted exactly once, when the watermark passes its end — the
    finalization semantics the complete-mode memory demo can't show
    (complete re-emits all state every batch; append is what a 100 TB
    stream must use, since state for closed windows is evicted).

    The bounded events table is re-staged as ``n_files`` range-
    partitioned files so the file source (maxFilesPerTrigger=1) delivers
    time-ascending micro-batches and the watermark genuinely advances
    between them; a single-file source yields one batch whose starting
    watermark finalizes nothing.
    """
    from proto_to_avro_ql_spark.sources.io import read_table

    ev_batch = read_table(spark, sf_dir, "events")
    # range-partition on ts: part-00000 holds the earliest range, so the
    # file source (ordered by mod-time, then path) replays in time order.
    ev_batch.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(staging)

    ev = (
        spark.readStream.schema(ev_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .withWatermark("ts", watermark)
    )
    agg = (
        ev.groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_path)
