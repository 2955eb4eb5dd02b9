"""Bucketed staging: co-locate fact tables on their join key so
repeated joins are shuffle-free (SURVEY.md §4 'reuse a partitioning
across stages'; the scale strategy for the reference's motivating
use case — 'lift ids to the top level to facilitate easier joins',
README.md:112-113, done properly at warehouse scale).

Writing both sides bucketed (and sorted) on the key means every
subsequent equi-join on that key is a zero-exchange sort-merge join:
at 100 TB that removes the single largest cost in the pipeline. The
plan assertion lives in tests/test_plans.py::TestBucketedJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
) -> DataFrame:
    """Materialize ``df`` as a bucketed+sorted managed table and return
    the (bucket-aware) scan. One file per bucket (repartition first) so
    the bucket-sort metadata lets SMJ skip both exchange AND sort."""
    spark = df.sparkSession
    (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def bucketed_equi_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    num_buckets: int = 16,
    names: tuple[str, str] = ("bkt_left", "bkt_right"),
) -> DataFrame:
    """Stage both sides bucketed on the key, then join shuffle-free."""
    bl = stage_bucketed(left, names[0], key_left, num_buckets)
    br = stage_bucketed(right, names[1], key_right, num_buckets)
    return bl.join(br, bl[key_left] == br[key_right])
