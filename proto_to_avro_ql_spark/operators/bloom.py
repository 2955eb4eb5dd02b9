"""Bloom-filter semi-join pruning — the dynamic-filtering pattern.

``fact ⋉ dim`` at lake scale shuffles every fact row that survives its
scan filters. When the dim side is selective, almost all of that
shuffle is waste: the rows die in the join. Engines solve this with a
runtime filter — build a Bloom filter over the dim join keys, push it
into the fact scan, and only shuffle probable matches (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled``, Trino/Presto
dynamic filtering, DataFusion join pruning). This module implements
the pattern explicitly with DataFrame primitives so the engine can
apply it where the optimizer doesn't (across a staged/checkpoint
boundary, or feeding a non-join consumer).

Scale shape — the point of the design:

- **Build is O(m), not O(|dim|)**: dim keys explode to k bit
  positions, which aggregate into at most m/64 packed 64-bit words via
  ``bit_or`` (map-side partial aggregation; the shuffle carries ≤ m/64
  rows per mapper). Only those words — bounded by the filter size,
  independent of dim cardinality — reach the driver and are embedded
  as an array<long> literal: a 2^20-bit filter is 16384 longs
  ≈ 128 KiB, vs broadcasting the full key set.
- **Probe is codegen'd**: k bit tests against the literal array —
  plain expressions the fact scan absorbs as a filter; no UDF, no
  join, no shuffle for the pruned-away rows.
- **No false negatives by construction** (every dim key's bits are
  set), so the trailing EXACT semi-join only removes Bloom false
  positives; the final result is identical to the plain semi-join —
  exactly what the DuckDB oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic bit positions for a key: seeded xxhash64,
    non-negative mod m."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def build_bloom_words(
    dim: DataFrame, key: Column, m_bits: int = 1 << 16, k: int = 3
) -> list[int]:
    """Aggregate the dim keys' bit positions into ``m_bits // 64``
    packed words. The collect is bounded by the filter size (≤ m/64
    rows), never by dim cardinality — this is the build side of a
    runtime filter, not a data collect."""
    pos = dim.select(F.explode(F.array(*_positions(key, m_bits, k))).alias("pos"))
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), F.pmod("pos", F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for row in words:
        dense[row["w"]] = row["word"]
    return dense


def bloom_filter_condition(
    key: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """Membership test: all k bits set. Pure expressions over an
    array<long> literal — runs inside whole-stage codegen."""
    arr = F.lit(words)
    cond = None
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), F.pmod(p, F.lit(64)).cast("int")
        )
        this = word.bitwiseAND(mask) != 0
        cond = this if cond is None else (cond & this)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    fact_key: Column,
    dim: DataFrame,
    dim_key: Column,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """``fact ⋉ dim`` with a Bloom pre-filter on the fact side.

    Returns exactly the semi-join result — the Bloom stage is a
    performance rewrite, not an approximation (no false negatives)."""
    words = build_bloom_words(dim, dim_key, m_bits, k)
    pruned = fact.where(bloom_filter_condition(fact_key, words, m_bits, k))
    keys = dim.select(dim_key.alias("__bloom_dim_key")).distinct()
    return pruned.join(keys, fact_key == F.col("__bloom_dim_key"), "left_semi")
