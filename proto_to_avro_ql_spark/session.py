"""SparkSession factory tuned for the engine.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real
cluster the same settings (AQE on, skew-join handling, sensible shuffle
partitioning) are the ones you'd want at 100 TB — AQE coalesces the
static shuffle number down at small scale and splits skewed partitions
at large scale, so one config serves both.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "proto_to_avro_ql_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # and dynamic join-strategy switching — the scale-survival settings.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Static shuffle width for local mode; AQE coalesces below this.
        # On a 1000-executor cluster this would be set ~2-3x total cores.
        .config("spark.sql.shuffle.partitions", "32")
        # Keep nested-schema pruning explicit (on by default, load-bearing
        # for proj_paths: un-queried proto subtrees never leave parquet).
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # Arrow for any pandas_udf path (the slow-path escape hatch).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
