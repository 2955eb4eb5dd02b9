"""Deterministic stratified sampling (training-data pipeline op).

``df.sampleBy`` is seeded RNG: the sample changes with partitioning and
engine version, which is unacceptable for reproducible training sets.
Here membership is a pure function of the row key — a content hash
bucketed 0..99 compared against the stratum's rate — so the sample is
stable across runs, engines (the DuckDB oracle computes the identical
bucket), partitionings, and cluster sizes. No RNG, no shuffle: the
filter is a narrow expression the scan can absorb.

Related: ``ext_data_split`` (entry_registry.py) does the same trick for
train/val/test assignment with global rates; this operator varies the
rate per stratum (e.g. downsample dominant event types, keep all rare
ones — the class-rebalancing primitive).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket 0..buckets-1 from the md5 of the value's
    string form. md5 (not xxhash64) so the oracle is portable: DuckDB
    computes the same bucket via ('0x' || substr(md5(x),1,8))::BIGINT."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate[stratum] * 100.

    Rows whose stratum is not in ``rates`` are kept at ``default_rate``.
    Rates are interpreted at percent granularity (0.10 → buckets 0-9).
    """
    bucket = hash_bucket(F.col(key_col))
    keep = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], bucket < int(kv[1] * 100)),
        rates.items(),
        F.when(F.lit(False), F.lit(False)),
    ).otherwise(bucket < int(default_rate * 100))
    return df.where(keep)
